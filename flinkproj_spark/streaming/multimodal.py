"""Streaming twin of the multimodal decode path: the continuous-ingest
form a production corpus builder runs — binary payloads arrive on a
stream, the SAME Arrow-batched mapInPandas decode used by the batch
operator (operators/multimodal.py::_decode_pgm) extracts features
batch-at-a-time, and only the narrow stats rows reach the sink (the
payload bytes never travel past the decode stage).

The decode is stateless, so mapInPandas composes with readStream
directly — no watermark, no state store; exactly-once comes from the
file sink's transaction log + checkpoint, as with every stateless map
stage. Convergence to the batch operator is pinned by
tests/test_streaming_ext.py."""

from __future__ import annotations

from pyspark.sql import DataFrame

from flinkproj_spark.operators.multimodal import DECODE_SCHEMA, _decode_pgm


def stream_multimodal_decode(payloads: DataFrame) -> DataFrame:
    """Decode a stream of PGM-container binary payloads into feature
    rows. Input stream needs (doc_id, payload binary); output schema is
    the batch operator's DECODE_SCHEMA, so downstream consumers are
    interchangeable between the batch sweep and the ingest stream."""
    return payloads.select("doc_id", "payload").mapInPandas(
        _decode_pgm, schema=DECODE_SCHEMA
    )

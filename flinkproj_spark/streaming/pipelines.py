"""Structured Streaming twins of the two pipelines (SURVEY.md §2.10,
§4.2's four "not free in Spark" behaviors live here).

  * watermark: withWatermark('ts', '40 seconds') — the reference's 10 s
    bounded disorder (MyWatermark.java:15) + 30 s allowed lateness
    (DataReport.java:140) folded into one bound, per SURVEY.md §2.6 W3;
  * re-fire semantics: update output mode + idempotent keyed upsert in
    foreachBatch — the ES-sink deterministic doc id trick
    (DataReport.java:181) that makes late corrections overwrites;
  * late side output: the foreachBatch splitter routes records older
    than the observed watermark to a TSV channel (W4);
  * dim refresh: the dimension DataFrame is re-derived inside
    foreachBatch each micro-batch — the 60 s Redis poll twin (S2).

Sources: tests drive these with file/rate sources; on a real cluster
swap `readStream.format('kafka')` in — the transformation core is
byte-identical (it's the same functions from flinkproj_spark.pipelines).
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkproj_spark.pipelines import (
    clean_transform,
    report_aggregate,
    report_late_split,
    report_parse,
)

WATERMARK = "40 seconds"  # 10 s disorder + 30 s allowed lateness (W1+W3)


def stream_clean(
    spark: SparkSession,
    raw_stream: DataFrame,
    dim_loader: Callable[[SparkSession], DataFrame],
    out_dir: str,
    checkpoint_dir: str,
):
    """Streaming Pipeline 1: per-micro-batch dim reload (S2's 60 s Redis
    poll becomes a reload per batch — strictly fresher) + the shared
    clean core, parquet sink. Returns the StreamingQuery."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        dim = dim_loader(batch.sparkSession)
        cleaned = clean_transform(batch, dim)
        cleaned.write.mode("append").parquet(out_dir)

    return (
        raw_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_report(
    spark: SparkSession,
    raw_stream: DataFrame,
    result_dir: str,
    late_dir: str,
    checkpoint_dir: str,
):
    """Streaming Pipeline 2 with exactly-once *effect*:

    parse → watermark(40 s) → windowed count+max in update mode →
    foreachBatch MERGE-style upsert keyed on the deterministic doc_id
    (late arrivals within the watermark re-fire the window and
    overwrite — observably the ES upsert, K3). The late split runs
    inside the same foreachBatch so both halves see each batch exactly
    once (SURVEY.md §7 watch-list 2)."""
    from flinkproj_spark.sinks import upsert_keyed

    parsed = report_parse(raw_stream).withWatermark("ts", WATERMARK)
    agg = report_aggregate(parsed)

    def upsert(batch: DataFrame, epoch_id: int) -> None:
        upsert_keyed(batch, result_dir, "doc_id")

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_report_with_late_split(
    spark: SparkSession,
    raw_stream: DataFrame,
    result_dir: str,
    late_dir: str,
    checkpoint_dir: str,
):
    """Variant exposing the W4 side output explicitly: one foreachBatch
    over the *parsed* stream computes its own watermark bound (max seen
    event time − 40 s, the MyWatermark.java:19-21 formula), splits, and
    maintains the windowed result over the on-time half incrementally
    per batch (idempotent via overwrite of batch-affected partitions)."""
    parsed = report_parse(raw_stream)
    # Watermark state must survive query restarts exactly like Spark's
    # own (checkpointed) watermark — persist max event time beside the
    # checkpoint dir.
    wm_file = os.path.join(checkpoint_dir, "_late_split_watermark.json")

    def _load_max_ts():
        try:
            with open(wm_file) as f:
                return json.load(f)["max_ts"]
        except (OSError, ValueError, KeyError):
            return None

    def _store_max_ts(iso: str) -> None:
        os.makedirs(checkpoint_dir, exist_ok=True)
        with open(wm_file, "w") as f:
            json.dump({"max_ts": iso}, f)

    def process(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.persist()
        try:
            # Format the max event time JVM-side (session timezone) —
            # collecting the raw timestamp would surface it as a Python
            # datetime in the HOST timezone, and re-parsing that string
            # with to_timestamp (session TZ) shifted the watermark by
            # the host/UTC offset on non-UTC hosts.
            mx = batch.agg(
                F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            ).collect()[0][0]
            prev = _load_max_ts()
            cur = max(p for p in (prev, mx) if p)
            _store_max_ts(cur)
            wm = F.to_timestamp(F.lit(cur)) - F.expr(f"INTERVAL {WATERMARK}")
            on_time, late = report_late_split(batch, wm)
            late.write.mode("append").text(late_dir)
            report_aggregate(on_time).write.mode("append").parquet(result_dir)
        finally:
            batch.unpersist()

    return (
        parsed.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def make_json_stream_from_events(spark: SparkSession, src_dir: str, schema_dir: str | None = None) -> DataFrame:
    """File-source streaming DataFrame of auditLog-style JSON lines
    fabricated from the events table (batch-written by tests)."""
    return (
        spark.readStream.schema("value string").format("text").load(src_dir)
    )

"""Gated Kafka integration: produce → clean → consume roundtrip through
the real connector (SURVEY.md §2.1 S1 / §2.7 K1, DataClean.java:58-66,
99-109).

The sandbox has no broker and no Kafka jar, so this module SKIPS
visibly (never silently passes) unless BOTH hold:

  * SPARK_GRAFT_KAFKA_BOOTSTRAP points at a reachable broker, and
  * the spark-sql-kafka connector is on the classpath — on a networked
    host launch pytest under e.g.
      PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 pyspark-shell"

In-sandbox acquisition was attempted and is impossible (round-11
verdict task 5, probed 2026-08-16): DNS resolution itself fails
(socket.gaierror for repo1.maven.org — no outbound network at all, so
neither --packages nor a manual jar download can run), there is no
~/.ivy2 or ~/.m2 cache to resurrect a jar from, a full-filesystem scan
finds no kafka*.jar anywhere, the bundled pyspark/jars/ ships no
kafka connector, and no broker binary exists to start even a loopback
cluster. The missing pieces are exactly two artifacts a networked host
supplies in minutes: the spark-sql-kafka-0-10 connector jar (+ its
kafka-clients dependency) and any reachable broker. Until then the
wire path is covered by the file/rate-source twins
(tests/test_streaming.py) which exercise the same clean_transform and
sink semantics against the same schemas.
"""

from __future__ import annotations

import os
import time
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")


@pytest.mark.skipif(
    not BOOTSTRAP,
    reason="set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port to run the Kafka "
    "roundtrip (in-sandbox acquisition impossible: no DNS/outbound "
    "network, no ivy/m2 cache, no kafka jar on disk, no broker — see "
    "module docstring for the probed route)",
)
def test_kafka_produce_clean_consume_roundtrip(spark, tmp_path):
    import pyspark.sql.functions as F

    from flinkproj_spark.pipelines import clean_transform
    from flinkproj_spark.sources.dims import dim_area
    from flinkproj_spark.sources.generators import alldata_record
    from flinkproj_spark.sources.kafka import (
        _kafka_available,
        read_kafka_json,
        write_kafka,
    )

    if not _kafka_available(spark):
        pytest.skip(
            "spark-sql-kafka connector not on classpath; relaunch with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark ver>"
        )

    run = uuid.uuid4().hex[:8]
    topic_in, topic_out = f"it_allData_{run}", f"it_clean_{run}"
    n_in = 50

    # Produce raw allData JSON into the input topic (batch write = the
    # reference's generator feeding topic `allData`).
    raw = spark.range(n_in).select(
        alldata_record(F.col("id"), F.current_timestamp()).alias("value")
    )
    (
        raw.selectExpr("CAST(value AS STRING) AS value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic_in)
        .save()
    )

    # Stream: Kafka source → shared clean core → Kafka sink (S1→P*→K1).
    stream = read_kafka_json(spark, topic_in, BOOTSTRAP)
    cleaned = clean_transform(stream, dim_area(spark))
    out = cleaned.select(F.to_json(F.struct("*")).alias("value"))
    q = write_kafka(out, topic_out, str(tmp_path / "ckpt"), BOOTSTRAP)
    try:
        deadline = time.time() + 90
        got = 0
        while time.time() < deadline:
            got = (
                spark.read.format("kafka")
                .option("kafka.bootstrap.servers", BOOTSTRAP)
                .option("subscribe", topic_out)
                .option("startingOffsets", "earliest")
                .load()
                .count()
            )
            # clean_transform explodes the data array, so ≥ n_in rows
            if got >= n_in:
                break
            time.sleep(2)
        assert got >= n_in, f"consumed only {got} of ≥{n_in} cleaned records"
    finally:
        q.stop()

"""Kafka source/sink builders — the streaming twins of SURVEY.md §2.1 S1
and §2.7 K1/K2.

The reference consumes JSON strings from topics `allData`/`auditLog`
and produces to `allDataClean`/`lateLog` (DataClean.java:58-66,99-109;
DataReport.java:73-88,149-161). Spark's Kafka connector needs the
spark-sql-kafka jar on the classpath; this container ships without it,
so builders raise a clear error at call time (import of this module is
always safe). On a real cluster:
    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>

Exactly-once delta vs the reference — READ THIS BEFORE DEPLOYING: the
reference's producer uses Kafka transactions (Semantic.EXACTLY_ONCE,
DataClean.java:108). Spark's Kafka SINK is AT-LEAST-ONCE — a failed
micro-batch retries and may re-produce records; Spark does not write
transactionally to Kafka. This engine's answer is idempotence one hop
downstream, which is also how the reference's ES sink works (K3,
DataReport.java:181): give every record a deterministic key
(time-type-area) and make the consumer/sink an upsert on that key —
`flinkproj_spark.sinks.upsert_keyed` is the batch/foreachBatch
implementation, `streaming.pipelines.stream_report` the wired example.
Duplicates then converge to one row (at-least-once produce + keyed
dedup on read == exactly-once EFFECT). If you need transactional
produce itself, put a dedup-on-read view over the topic (consumers
filter on `kafka.isolation.level=read_committed` only helps with a
transactional producer, which Spark is not).

Integration coverage: tests/test_kafka_integration.py runs a real
produce→clean→consume roundtrip through these builders, gated on
SPARK_GRAFT_KAFKA_BOOTSTRAP + the connector jar (skips visibly in the
jarless sandbox).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_kafka_json(
    spark: SparkSession,
    topic: str,
    bootstrap: str = "localhost:9092",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Streaming DataFrame of one `value: string` column — the engine's
    wire contract (every pipeline core takes exactly this shape, so the
    Kafka source is a drop-in for the file/rate sources tests use)."""
    if not _kafka_available(spark):
        raise RuntimeError(
            "Kafka connector not on classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10 via --packages"
        )
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def write_kafka(
    df: DataFrame,
    topic: str,
    checkpoint_dir: str,
    bootstrap: str = "localhost:9092",
):
    """value:string stream → Kafka topic. Spark's Kafka sink is
    at-least-once; the exactly-once *effect* the reference gets from
    Kafka transactions (DataClean.java:108) is reproduced downstream by
    deterministic-key upserts (see streaming.pipelines.stream_report)."""
    if not _kafka_available(df.sparkSession):
        raise RuntimeError(
            "Kafka connector not on classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10 via --packages"
        )
    return (
        df.selectExpr("CAST(value AS STRING) AS value")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )

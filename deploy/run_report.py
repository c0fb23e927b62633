"""YARN driver main for the report pipeline — the spark-submit payload
of deploy/start_report_yarn.sh (reference behavior: DataReport.java:48-204
— Kafka `auditLog` JSON → tolerant parse → watermark → 30 s windowed
count+max → keyed upsert (the ES-doc-id effect) + late TSV side output
to Kafka `lateLog`). Logic is the shared core from
flinkproj_spark/streaming/pipelines.py::stream_report_with_late_split."""

from __future__ import annotations

import argparse
import os
import sys

# Local/driver-node runs: make the repo importable without the
# --py-files zip (on YARN executors the zip supplies the package).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from flinkproj_spark.sources.kafka import read_kafka_json
from flinkproj_spark.streaming.pipelines import stream_report_with_late_split


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bootstrap", default="localhost:9092")
    ap.add_argument("--in-topic", default="auditLog")
    ap.add_argument("--result-dir", required=True)
    ap.add_argument("--late-dir", required=True)
    ap.add_argument("--checkpoint", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("DataReportJob").getOrCreate()
    raw = read_kafka_json(spark, args.in_topic, bootstrap=args.bootstrap)
    query = stream_report_with_late_split(
        spark, raw, args.result_dir, args.late_dir, args.checkpoint
    )
    query.awaitTermination()


if __name__ == "__main__":
    main()

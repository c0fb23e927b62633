"""YARN driver main for the clean pipeline — the spark-submit payload
of deploy/start_clean_yarn.sh (reference behavior: DataClean.java:37-114
— Kafka `allData` JSON → parse/explode/dim-enrich → Kafka
`allDataClean`). The session takes master/sizing from spark-submit; all
transform logic is the same shared core the tests and oracle keys
exercise (flinkproj_spark/pipelines.py::clean_transform)."""

from __future__ import annotations

import argparse
import os
import sys

# Local/driver-node runs: make the repo importable without the
# --py-files zip (on YARN executors the zip supplies the package).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from flinkproj_spark.pipelines import clean_transform
from flinkproj_spark.sources.dims import dim_area
from flinkproj_spark.sources.kafka import read_kafka_json, write_kafka


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bootstrap", default="localhost:9092")
    ap.add_argument("--in-topic", default="allData")
    ap.add_argument("--out-topic", default="allDataClean")
    ap.add_argument("--checkpoint", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("DataCleanJob").getOrCreate()
    raw = read_kafka_json(spark, args.in_topic, bootstrap=args.bootstrap)
    cleaned = clean_transform(raw, dim_area(spark)).selectExpr(
        "to_json(struct(*)) AS value"
    )
    query = write_kafka(
        cleaned, args.out_topic, args.checkpoint, bootstrap=args.bootstrap
    )
    query.awaitTermination()


if __name__ == "__main__":
    main()

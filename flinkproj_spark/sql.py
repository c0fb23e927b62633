"""SQL entry point: the full Spark SQL surface over the corpus tables.

The reference has no SQL anywhere (SURVEY.md §2.9); the target engine
gets the entire ANSI surface from Spark for free once tables are
registered. This module is that registration — `sql()` is the
user-facing "run any query the reference user could ever need" API,
and the oracle harness exercises the same views on the DuckDB side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flinkproj_spark.sources.tables import TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (idempotent). Views
    are lazy plans over the parquet scans — pushdown/pruning still
    reach the files through them."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run arbitrary SQL against the corpus tables."""
    register_tables(spark, sf_dir)
    return spark.sql(query)

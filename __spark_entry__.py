"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (window_count, SURVEY.md §2.5 A1) at sf0.001.
queries()    — every implemented operator from SURVEY.md §2 + extensions,
               collected from flinkproj_spark.operators.*.
oracle_sql() — DuckDB ANSI-SQL twins for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flinkproj_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: keyed 30 s tumbling-window count+max over events
    (the heart of the reference's DataReport pipeline, MyAggFunction.java:19-51)."""
    from flinkproj_spark.operators.report import window_count

    return window_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()

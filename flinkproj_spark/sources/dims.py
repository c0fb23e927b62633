"""Dimension-table builders.

The reference's dimension source is a Redis hash polled every 60 s
(`MyRedisSource.java:27-75`): {AREA_US: "US", AREA_CT: "TW,HK", ...}
inverted into a country→area map and broadcast to every task. Here a
dimension is just a small DataFrame; the inversion is a declarative
explode(split(...)), and "broadcast to every task" is the broadcast()
join hint at the join site (SURVEY.md §2.1 S2, §2.4 J1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The reference's Redis `areas` hash, verbatim (MyRedisSource.java:16-19).
AREA_HASH: dict[str, str] = {
    "AREA_US": "US",
    "AREA_CT": "TW,HK",
    "AREA_AR": "PK,KW,SA",
    "AREA_IN": "IN",
}


def dim_area(spark: SparkSession, area_hash: dict[str, str] | None = None) -> DataFrame:
    """country→area dimension: invert {area: "C1,C2"} by exploding the
    comma list. 7 rows for the reference hash; always broadcast-sized."""
    rows = [(a, cs) for a, cs in (area_hash or AREA_HASH).items()]
    raw = spark.createDataFrame(rows, "area string, countries string")
    return raw.select(
        F.explode(F.split("countries", ",")).alias("country"),
        "area",
    )

"""Pipeline-1 (DataClean) operator family: parse → explode → enrich.

Reference behaviors re-expressed declaratively (SURVEY.md §2.2-2.4):
  * json_extract     — fastjson field extraction (DataClean.java:77-79)
  * explode_data     — flatMap over the nested `data` array (DataClean.java:83-90)
  * dim_join         — hand-rolled broadcast CoFlatMap join (DataClean.java:69-97)
  * enrich_serialize — field injection + re-serialize (DataClean.java:87-89)

All four stay entirely JVM-side (from_json / explode / broadcast join /
concat): no Python in the hot path, whole-stage codegen end-to-end, and
the dim join is a BroadcastHashJoin so the 100 TB fact side never
shuffles for enrichment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from flinkproj_spark.sources.tables import load_table

PROPS_SCHEMA = StructType([StructField("k", IntegerType())])


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON `props` payload once at the edge and project typed
    fields — the Spark twin of fastjson's per-record getString/getJSONArray
    (DataClean.java:77-79). from_json yields NULL for corrupt/missing
    fields, matching the reference's permissive lookup."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        "event_type",
        F.from_json("props", PROPS_SCHEMA).getField("k").alias("k"),
    )


def explode_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N flatten of an array<struct> payload with parent enrichment —
    the reference's only table-generating operator (DataClean.java:83-90:
    loop over data[], emit one record per element carrying parent dt).

    The corpus events table has no array column, so each event fabricates
    the reference generator's 2-element data array (kafkaProducer.java:34)
    from its own fields; explode() then does the 1→N. Exact-arithmetic
    scores (value, value+1) keep the DuckDB oracle bit-identical."""
    events = load_table(spark, sf_dir, "events")
    with_arr = events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("dt"),
        F.array(
            F.struct(F.lit("s1").alias("type"), F.col("value").alias("score")),
            F.struct(F.lit("s2").alias("type"), (F.col("value") + F.lit(1.0)).alias("score")),
        ).alias("data"),
    )
    ex = with_arr.select("event_id", "dt", F.explode("data").alias("d"))
    return ex.select(
        "event_id",
        "dt",
        F.col("d.type").alias("type"),
        F.col("d.score").alias("score"),
    )


def dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left broadcast equi-join of the fact stream against a small
    dimension, with the Scala path's 'other' default for missing keys
    (DataClean.java:69-97 hand-rolls this via connect+CoFlatMap;
    DataCleanScala.scala:68 adds getOrElse("other")).

    Dim = nation⋈region (country key → region/area name). The fact key
    user_id%30 intentionally overflows the 25-nation key space so the
    missing-key→'other' path is exercised. broadcast() pins a
    BroadcastHashJoin: at 100 TB the fact side is never shuffled."""
    events = load_table(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dim = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").alias("country_key"),
        F.col("r_name").alias("area"),
    )
    fact = events.withColumn("country_key", (F.col("user_id") % F.lit(30)).cast("int"))
    joined = fact.join(F.broadcast(dim), "country_key", "left")
    return joined.select(
        "event_id",
        "event_type",
        F.coalesce("area", F.lit("other")).alias("area"),
    )


def enrich_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field injection + re-serialization (DataClean.java:87-89: put
    area/dt onto each child object, toJSONString back out).

    The JSON line is built with concat so the oracle can produce the
    byte-identical string; in the streaming pipeline the idiomatic
    to_json(struct(...)) is used instead (engine JSON serializers differ
    in float formatting, not semantics)."""
    enriched = dim_join(spark, sf_dir)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("dt")
    )
    # both sides are events-derived facts: pinned to a shuffle join —
    # Catalyst would broadcast the pruned events projection at small SF
    out = enriched.join(events.hint("merge"), "event_id")
    return out.select(
        "event_id",
        F.concat(
            F.lit('{"type":"'), "event_type",
            F.lit('","area":"'), "area",
            F.lit('","dt":"'), "dt",
            F.lit('"}'),
        ).alias("json"),
    )


QUERIES = {
    "json_extract": json_extract,
    "explode_data": explode_data,
    "dim_join": dim_join,
    "enrich_serialize": enrich_serialize,
}

ORACLE = {
    "json_extract": """
        SELECT event_id,
               event_type,
               TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events
    """,
    "explode_data": """
        SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS dt,
               's1' AS type, "value" AS score FROM events
        UNION ALL
        SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS dt,
               's2' AS type, "value" + 1.0 AS score FROM events
    """,
    "dim_join": """
        SELECT e.event_id,
               e.event_type,
               COALESCE(r.r_name, 'other') AS area
        FROM events e
        LEFT JOIN nation n ON CAST(e.user_id % 30 AS INTEGER) = n.n_nationkey
        LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    "enrich_serialize": """
        SELECT e.event_id,
               '{"type":"' || e.event_type || '","area":"' ||
               COALESCE(r.r_name, 'other') || '","dt":"' ||
               strftime(e.ts, '%Y-%m-%d %H:%M:%S') || '"}' AS json
        FROM events e
        LEFT JOIN nation n ON CAST(e.user_id % 30 AS INTEGER) = n.n_nationkey
        LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
}

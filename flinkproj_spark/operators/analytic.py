"""Analytic shapes beyond rollup/cube/pivot: grouping sets, interval
self-join, exact percentiles, and fixed-width histograms.

The reference has no aggregation surface beyond windowed count+max
(SURVEY.md §2.5/§2.9); Spark provides these natively and this module
declares them so the oracle exercises the remaining aggregate/join
shapes: explicit GROUPING SETS (the general form rollup/cube are sugar
for), a time-interval self-join (the range-join family), interpolated
percentile aggregates, and value binning.

Scale notes:
  * grouping sets run as one pass with Expand — no N-pass unions;
  * the interval self-join shuffles both sides on the equi-key
    (customer) once, and the date-band predicate runs codegen'd inside
    the joined partition — never a cross join;
  * percentiles use Spark's exact `percentile` (single shuffle,
    per-group t-digest-free exact path) over integer cents so the
    interpolation arithmetic is engine-identical;
  * histogram buckets quantize the measure to integer e6 units before
    summing — order-independent partial aggregation, no float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkproj_spark.operators.relational import _cents
from flinkproj_spark.sources.tables import load_table


def grouping_sets_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts + exact revenue per status, per priority, and grand
    total — GROUPING SETS ((status),(priority),()) in ONE Expand pass."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(_cents("o_totalprice")).alias("_total_c"),
    )
    return agg.select(
        "o_orderstatus",
        "o_orderpriority",
        "n_orders",
        (F.col("_total_c").cast("double") / F.lit(100.0)).alias("total_price"),
    )


def time_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup (the continuous-aggregate
    analog): minute/hour/day time buckets per event_type, computed in ONE
    Expand pass via GROUPING SETS — the scan reads events once and the
    single shuffle carries already-combined partial aggregates for all
    three resolutions. At 100 TB this replaces three separate rollup jobs
    with one, and the coarse resolutions come almost free (their
    cardinality is dwarfed by minute's). Value sums use exact integer
    cents (see relational._cents) so hashes match across engines."""
    events = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss"
    base = events.select(
        F.date_format(F.date_trunc("minute", "ts"), fmt).alias("b_min"),
        F.date_format(F.date_trunc("hour", "ts"), fmt).alias("b_hour"),
        F.date_format(F.date_trunc("day", "ts"), fmt).alias("b_day"),
        "event_type",
        _cents("value").alias("v_c"),
    )
    agg = base.groupingSets(
        [["b_min", "event_type"], ["b_hour", "event_type"], ["b_day", "event_type"]],
        "b_min",
        "b_hour",
        "b_day",
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum("v_c").alias("_v"),
        F.grouping("b_min").alias("_g_min"),
        F.grouping("b_hour").alias("_g_hour"),
    )
    res = (
        F.when(F.col("_g_min") == 0, F.lit("minute"))
        .when(F.col("_g_hour") == 0, F.lit("hour"))
        .otherwise(F.lit("day"))
    )
    return agg.select(
        res.alias("resolution"),
        F.coalesce("b_min", "b_hour", "b_day").alias("bucket"),
        "event_type",
        "n",
        (F.col("_v").cast("double") / F.lit(100.0)).alias("value_sum"),
    )


def interval_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer, how many ordered pairs of their orders fall within
    30 days of each other — the interval/range-join shape. Equi-key
    (o_custkey) carries the shuffle; the band predicate is evaluated
    post-join inside each customer partition, so work is
    O(orders_per_customer²) per key, never O(n²) global."""
    o1 = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("k1"),
        F.col("o_orderdate").alias("d1"),
    )
    o2 = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey2"),
        F.col("o_orderkey").alias("k2"),
        F.col("o_orderdate").alias("d2"),
    )
    # fact self-join: pinned to shuffle on the equi key (stats at small
    # SF would broadcast one orders projection — corpus-proportional)
    pairs = o1.join(o2.hint("merge"), F.col("custkey") == F.col("custkey2")).filter(
        (F.col("d2") > F.col("d1"))
        & (F.col("d2") <= F.col("d1") + F.expr("INTERVAL 30 DAYS"))
    )
    return pairs.groupBy("custkey").agg(F.count("*").alias("pair_cnt"))


def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median / p90 of customer balance per market
    segment, computed over integer cents so Spark and the oracle share
    the same interpolation inputs bit-for-bit."""
    cust = load_table(spark, sf_dir, "customer")
    bal_c = _cents("c_acctbal")
    agg = cust.groupBy("c_mktsegment").agg(
        F.percentile(bal_c, F.lit(0.5)).alias("_p50_c"),
        F.percentile(bal_c, F.lit(0.9)).alias("_p90_c"),
        F.count("*").alias("n_cust"),
    )
    return agg.select(
        "c_mktsegment",
        F.round(F.col("_p50_c") / F.lit(100.0), 6).alias("median_bal"),
        F.round(F.col("_p90_c") / F.lit(100.0), 6).alias("p90_bal"),
        "n_cust",
    )


def approx_percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate median / p90 per market segment via Spark's
    Greenwald-Khanna quantile sketch (`approx_percentile`) — the 100 TB
    path where exact percentile's full per-group sort/collect is too
    big. Fixed-size mergeable sketch per group, map-side combinable,
    constant memory at any cardinality. No oracle entry (DuckDB's
    approx sketch differs); the error bound vs the exact twin
    (percentile_stats) is pinned by a test, mirroring the
    approx_distinct_counts/HLL treatment."""
    cust = load_table(spark, sf_dir, "customer")
    bal_c = _cents("c_acctbal")
    agg = cust.groupBy("c_mktsegment").agg(
        F.approx_percentile(bal_c, F.lit(0.5), F.lit(10000)).alias("_p50_c"),
        F.approx_percentile(bal_c, F.lit(0.9), F.lit(10000)).alias("_p90_c"),
        F.count("*").alias("n_cust"),
    )
    return agg.select(
        "c_mktsegment",
        (F.col("_p50_c").cast("double") / F.lit(100.0)).alias("median_bal_approx"),
        (F.col("_p90_c").cast("double") / F.lit(100.0)).alias("p90_bal_approx"),
        "n_cust",
    )


def histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of events.value (width 10): per bucket, row
    count and exact sum (value quantized to e6 integer units pre-sum)."""
    events = load_table(spark, sf_dir, "events")
    v_e6 = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
    agg = events.groupBy(
        F.floor(F.col("value") / 10).cast("long").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum(v_e6).alias("_sum_e6"),
    )
    return agg.select(
        "bucket",
        "n",
        (F.col("_sum_e6").cast("double") / F.lit(1000000.0)).alias("sum_value"),
    )


QUERIES = {
    "grouping_sets_counts": grouping_sets_counts,
    "time_rollup_multires": time_rollup_multires,
    "interval_join_pairs": interval_join_pairs,
    "percentile_stats": percentile_stats,
    "approx_percentile_stats": approx_percentile_stats,
    "histogram_value": histogram_value,
}
# approx_percentile_stats: intentionally no ORACLE entry — rows-only
# check (sketch implementations differ across engines); accuracy vs the
# exact twin is pinned by tests/test_operators.py.

ORACLE = {
    "time_rollup_multires": """
        WITH base AS (
          SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS b_min,
                 strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS b_hour,
                 strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS b_day,
                 event_type,
                 CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
          FROM events)
        SELECT CASE WHEN GROUPING(b_min) = 0 THEN 'minute'
                    WHEN GROUPING(b_hour) = 0 THEN 'hour'
                    ELSE 'day' END AS resolution,
               COALESCE(b_min, b_hour, b_day) AS bucket,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(v_c) AS DOUBLE) / 100.0 AS value_sum
        FROM base
        GROUP BY GROUPING SETS ((b_min, event_type), (b_hour, event_type),
                                (b_day, event_type))
    """,
    "grouping_sets_counts": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "interval_join_pairs": """
        SELECT o1.o_custkey AS custkey, COUNT(*) AS pair_cnt
        FROM orders o1 JOIN orders o2 ON o1.o_custkey = o2.o_custkey
        WHERE o2.o_orderdate > o1.o_orderdate
          AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY
        GROUP BY 1
    """,
    "percentile_stats": """
        SELECT c_mktsegment,
               ROUND(quantile_cont(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT), 0.5)
                     / 100.0, 6) AS median_bal,
               ROUND(quantile_cont(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT), 0.9)
                     / 100.0, 6) AS p90_bal,
               COUNT(*) AS n_cust
        FROM customer
        GROUP BY 1
    """,
    "histogram_value": """
        SELECT CAST(FLOOR(value / 10) AS BIGINT) AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 1000000.0 AS sum_value
        FROM events
        GROUP BY 1
    """,
}

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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkproj_spark.operators.relational import TD_MOD, _cents
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


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: how many users progressed view → click
    → purchase IN TEMPORAL ORDER (a later-stage event only counts if it
    happens strictly after the user's earliest qualifying prior stage).

    Shape: ONE exchange on user_id, then three chained window passes
    over the same partitioning (each stage's earliest-qualifying
    timestamp references the previous stage's column — Spark reuses the
    sort/partition, no new shuffle), then a 1-row conditional
    aggregate. At 100 TB this is a single fact shuffle; the per-user
    event timeline never leaves its partition."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    s1 = events.select(
        "user_id",
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w).alias("t1"),
    )
    s2 = s1.select(
        "*",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
        ).over(w).alias("t2"),
    )
    s3 = s2.select(
        "*",
        F.min(
            F.when((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts"))
        ).over(w).alias("t3"),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max(F.col("t1").isNotNull().cast("int")).alias("r1"),
        F.max(F.col("t2").isNotNull().cast("int")).alias("r2"),
        F.max(F.col("t3").isNotNull().cast("int")).alias("r3"),
    )
    agg = per_user.agg(
        F.sum("r1").alias("n_view"),
        F.sum("r2").alias("n_view_click"),
        F.sum("r3").alias("n_view_click_purchase"),
    )
    return agg.selectExpr(
        "CAST(n_view AS BIGINT) AS n_view",
        "CAST(n_view_click AS BIGINT) AS n_view_click",
        "CAST(n_view_click_purchase AS BIGINT) AS n_view_click_purchase",
        "(n_view_click * 100) div nullif(n_view, 0) AS pct_click",
        "(n_view_click_purchase * 100) div nullif(n_view, 0) AS pct_purchase",
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    counted as retained in each later week they were active — the
    standard growth-analytics triangle.

    Shape: per-user first week via one map-side-combined min aggregate,
    joined back on user_id (one narrow shuffle — 2 longs per row),
    distinct (cohort, offset, user) then the cohort rollup. Weeks are
    integer epoch-DAY divisions (datediff is exact integer arithmetic
    in both engines — epoch-second doubles are not)."""
    events = load_table(spark, sf_dir, "events")
    week = F.floor(F.datediff(F.to_date("ts"), F.lit("1970-01-01")) / 7).cast("long")
    acts = events.select("user_id", week.alias("week")).distinct()
    first = acts.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    joined = acts.join(first, "user_id").select(
        "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"), "user_id"
    )
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly counts per event type: events whose value sits
    more than 3 population standard deviations from the type mean —
    the data-quality screen every ingest pipeline runs.

    Shape: ONE map-side-combined aggregate produces exact integer
    moments (value quantized to e4; the squared sums accumulate in
    DECIMAL(38,0) so they stay exact at 100 TB row counts, where a
    BIGINT sum of squares would overflow); the 5-row stats frame
    broadcasts back onto the scan for the outlier count — two passes
    over the fact, zero fact shuffles. Mean/std become doubles only at
    the very end, in an expression mirrored exactly by the oracle."""
    events = load_table(spark, sf_dir, "events")
    v_e4 = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    stats = (
        events.select("event_type", v_e4.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("_s"),
            # cast BEFORE multiplying: a LongType v*v wraps (or throws
            # under ANSI) for |value| ≳ 3e5; decimal(38,0)*long is exact
            F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("_ss"),
        )
    )
    mean = F.col("_s").cast("double") / F.col("n")
    var = F.col("_ss").cast("double") / F.col("n") - mean * mean
    enriched = stats.select(
        "event_type", "n", mean.alias("_mean"), F.sqrt(var).alias("_std")
    )
    joined = events.select("event_type", v_e4.alias("v")).join(
        F.broadcast(enriched), "event_type"
    )
    out = joined.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(
            (F.abs(F.col("v") - F.col("_mean")) > F.lit(3.0) * F.col("_std")).cast("long")
        ).alias("n_outliers"),
        F.max(F.round(F.col("_mean") / F.lit(10000.0), 4)).alias("mean_value"),
        F.max(F.round(F.col("_std") / F.lit(10000.0), 4)).alias("std_value"),
    )
    return out.select("event_type", "n", "mean_value", "std_value", "n_outliers")


#: approx_percentile_stats error band: the GK estimate must sit within
#: 5% of the exact interpolated quantile (with a 100-cent absolute
#: floor for near-zero quantiles). GK at accuracy=10000 guarantees rank
#: error <= n/10000; on the fixture corpus the measured value error is
#: far below 5% at every SF, while a broken sketch (wrong accuracy,
#: wrong fraction) lands whole segments away.
APS_BAND_PCT = 5


def approx_percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate median / p90 per market segment via Spark's
    Greenwald-Khanna quantile sketch (`approx_percentile`),
    SELF-AUDITING: the 100 TB path where exact percentile's full
    per-group sort is too big — fixed-size mergeable sketch per group,
    map-side combinable, constant memory at any cardinality.

    The raw estimate can never hash-match a DuckDB oracle (engine
    sketches differ), so — the audit-twin pattern of
    quantile_sketch_audit / approx_distinct_counts — the key outputs
    the exact interpolated quantiles plus the estimate's GUARANTEE: a
    within-APS_BAND_PCT verdict on the GK values, which the oracle pins
    to 1. A sketch regression flips the flag and hash-mismatches
    instead of hiding behind a rows-only check.

    Shape: ONE map-side-combined aggregate carries both the GK sketch
    and the exact percentile; at true 100 TB the exact anchor is the
    expensive half — this key is the VALIDATION run, the production
    path calls the sketch alone."""
    cust = load_table(spark, sf_dir, "customer")
    bal_c = _cents("c_acctbal")
    agg = cust.groupBy("c_mktsegment").agg(
        F.approx_percentile(bal_c, F.lit(0.5), F.lit(10000)).alias("_a50_c"),
        F.approx_percentile(bal_c, F.lit(0.9), F.lit(10000)).alias("_a90_c"),
        F.percentile(bal_c, F.lit(0.5)).alias("_p50_c"),
        F.percentile(bal_c, F.lit(0.9)).alias("_p90_c"),
        F.count("*").alias("n_cust"),
    )
    pct = F.lit(APS_BAND_PCT / 100.0)
    within = (
        F.abs(F.col("_a50_c") - F.col("_p50_c"))
        <= F.greatest(F.lit(100.0), pct * F.abs(F.col("_p50_c")))
    ) & (
        F.abs(F.col("_a90_c") - F.col("_p90_c"))
        <= F.greatest(F.lit(100.0), pct * F.abs(F.col("_p90_c")))
    )
    return agg.select(
        "c_mktsegment",
        "n_cust",
        F.round(F.col("_p50_c") / F.lit(100.0), 6).alias("median_bal"),
        F.round(F.col("_p90_c") / F.lit(100.0), 6).alias("p90_bal"),
        within.cast("int").alias("gk_within_band"),
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


_PATH_LEN = 5
_PATH_TOP = 20
_ROLL_WIN = 20   # rolling frame: the 20 preceding events
_ROLL_MIN = 10   # emit a verdict only with >= 10 history rows
_PR_SCALE = 1_000_000_000_000  # rank fixed-point scale (10^12)
_PR_ITERS = 3
_PR_DAMP_NUM, _PR_DAMP_DEN = 85, 100
_PR_TOP = 30


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for every ordered (prev_type, next_type) pair of
    consecutive events (by time, tie → event_id, within one user), the
    transition count and row-normalized probability in ppm — the
    companion of event_path_topk (full conditional structure instead
    of top prefixes; what journey-simulation and anomaly baselines
    consume).

    Shape: ONE shuffle on user_id feeds the lag window (per-user
    ordering, bounded by the user's own events); pair counting is a
    map-side-combined groupBy on (prev, next) — a key space of
    event-type², corpus-size-independent; row totals re-attach by
    broadcast. Integer ppm via div — bit-identical at any
    partitioning."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    trans = steps.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n_trans")
    )
    totals = trans.groupBy("prev_type").agg(F.sum("n_trans").alias("row_total"))
    return trans.join(F.broadcast(totals), "prev_type").selectExpr(
        "prev_type",
        "next_type",
        "n_trans",
        # DECIMAL(38,0) numerator: n_trans is corpus-sized, so ×1e6
        # wraps BIGINT past ~9.2e12 transitions (round-7 ADVICE —
        # same one-operand-cast pattern as hhi_by_nation).
        "CAST(CAST(n_trans AS DECIMAL(38,0)) * 1000000"
        " div row_total AS BIGINT) AS p_ppm",
    )


def event_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user journey prefixes: each user's first 5 event types
    (by time) joined into a path string, ranked by how many users share
    the path — the product-analytics "common flows" query.

    Shape: ONE shuffle on user_id serves both the row_number window
    and the per-user path assembly (same partitioning — Spark reuses
    the exchange); the path frequency count is map-side combined and
    the final top-k is TakeOrderedAndProject. The collect_list is
    bounded at 5 structs per user by the rank filter BEFORE the
    aggregation, so no unbounded per-key buffer exists at any scale."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_n = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PATH_LEN)
    )
    paths = first_n.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(_PATH_TOP)
    )


def anomaly_rolling_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over the event value stream,
    per event_type: each event is judged against the mean/variance of
    its 20 predecessors, flagged when (v - μ)² > 9σ² (|z| > 3).

    Exactness: values are integer cents, and the rule is evaluated as
    (n·v - s)² > 9·(n·ss - s²) — count and sum are BIGINT window sums;
    the squares (per-row v², the deviation square, and s²) run in
    DECIMAL(38,0) with one operand cast BEFORE multiplying, because a
    LongType square wraps (or throws under ANSI) around |v_c| ≈ 3·10⁹
    while the Python-int streaming twin stays exact. The verdict is
    integer arithmetic end to end: no float mean, no sqrt, no
    cross-engine ulp flips, immune to how either engine accumulates
    the sliding frame. One shuffle on event_type; the frame is
    ROWS-bounded so state per key is O(1)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-_ROLL_WIN, -1)
    )
    v = _cents("value")
    dec = "decimal(38,0)"
    base = events.select(
        "event_id", "event_type", "ts", v.alias("v_c")
    ).select(
        "event_id",
        "event_type",
        "ts",
        "v_c",
        F.count("v_c").over(w).alias("n"),
        F.sum("v_c").over(w).alias("s"),
        F.sum(F.col("v_c").cast(dec) * F.col("v_c")).over(w).alias("ss"),
    )
    dev = F.col("n").cast(dec) * F.col("v_c") - F.col("s")
    var_n2 = F.col("n").cast(dec) * F.col("ss") - F.col("s").cast(dec) * F.col("s")
    return (
        base.filter(F.col("n") >= _ROLL_MIN)
        .select(
            "event_id",
            "event_type",
            "v_c",
            "n",
            "s",
            (dev * dev > F.lit(9) * var_n2).cast("int").alias("is_anomaly"),
        )
    )


def pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the customer–supplier trade graph
    (an edge per distinct customer/supplier pair that shares an order,
    both directions), 3 iterations, damping 0.85 — the canonical
    iterative-algorithm shape on Spark.

    Exactness: ranks are fixed-point BIGINTs at scale 10¹². Each step
    is rank' = base + (85 · Σ (rank_u div deg_u)) div 100 — integer
    division only, so both engines agree bit-for-bit and the result is
    independent of partitioning and aggregation order (a double
    PageRank is neither).

    Shape: the edge list (with out-degree attached once) shuffles onto
    src per iteration to meet the rank frame, then combines map-side
    onto dst — two exchanges per iteration, the irreducible cost of
    synchronous PageRank. 3 iterations keep lineage shallow; at 10+
    iterations reuse the reliable-checkpoint pattern from
    dedup_cluster (operators/dedup.py). Output: top-30 nodes.

    Cache contract: the degree-annotated edge frame is persist()ed
    (MEMORY_AND_DISK, read once per iteration) and stays cached after
    the result materializes. Long-lived callers own the cache lifetime:
    call spark.catalog.clearCache() after consuming the result, as
    bench.py and tests/oracle_check.py do."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # Integer node ids (customer = 2k, supplier = 2k+1): every downstream
    # shuffle/join/groupBy keys on a BIGINT instead of a concat'd string
    # — measured ~2× on the iteration joins; the readable label is
    # reconstructed only for the 30 output rows.
    pairs = (
        orders.join(li.hint("merge"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # The degree-annotated edge frame is read once PER ITERATION: without
    # a persist, every iteration's plan re-runs the orders⋈lineitem
    # distinct from scratch (measured 7.8 s → the join chain dominates).
    # MEMORY_AND_DISK is the cluster-safe level — an executor loss
    # recomputes from lineage, an overflow spills instead of OOMing.
    from pyspark.storagelevel import StorageLevel

    ed = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    ranks = deg.select(F.col("src").alias("node"), F.lit(_PR_SCALE).alias("rank"))
    base = _PR_SCALE * (_PR_DAMP_DEN - _PR_DAMP_NUM) // _PR_DAMP_DEN
    for _ in range(_PR_ITERS):
        contrib = ed.join(
            ranks, ed.src == ranks.node
        ).select("dst", F.expr("rank div deg").alias("contrib"))
        ranks = contrib.groupBy("dst").agg(
            (
                # sum(contrib) is cast to DECIMAL(38,0) BEFORE the damping
                # multiply (the one-operand-cast pattern from
                # anomaly_rolling_z): a mega-hub whose incoming sum tops
                # ~1.08e17 would wrap the BIGINT 85·sum silently under
                # non-ANSI Spark while DuckDB promotes to HUGEINT. `div`
                # on decimals yields an exact BIGINT quotient.
                F.lit(base)
                + F.expr(
                    f"{_PR_DAMP_NUM} * CAST(sum(contrib) AS DECIMAL(38,0))"
                    f" div {_PR_DAMP_DEN}"
                )
            ).cast("long").alias("rank")
        ).select(F.col("dst").alias("node"), "rank")
    label = F.when(
        F.col("node") % 2 == 0, F.concat(F.lit("c"), (F.col("node") / 2).cast("long"))
    ).otherwise(F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("long")))
    return (
        ranks.orderBy(F.col("rank").desc(), "node")
        .limit(_PR_TOP)
        .select(label.alias("node"), "rank")
    )


CMS_D = 4      # count-min sketch depth (hash rows)
CMS_W = 1024   # counters per row
CMS_TOP = 20


def cms_hash_rows(df: DataFrame) -> DataFrame:
    """Shared CMS bucket expansion: (user_id, r, b) — one row per hash
    row per input record, md5-derived buckets. Used by the batch sketch
    and the streaming monitor twin so the two can never disagree on
    hashing."""
    buckets = [
        (
            r,
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"cms{r}:"), F.col("user_id").cast("string")
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % CMS_W
            ),
        )
        for r in range(CMS_D)
    ]
    return df.select(
        "user_id",
        F.explode(
            F.array(
                *[F.struct(F.lit(r).alias("r"), b.alias("b")) for r, b in buckets]
            )
        ).alias("h"),
    ).select("user_id", "h.r", "h.b")


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter audit (Cormode & Muthukrishnan
    2005, public): build a 4×1024 CMS over event user_ids, then report
    the sketch's estimate next to the exact count for the 20 heaviest
    users — the overestimate table that tells a monitoring owner
    whether this sketch geometry is tight enough before deploying it
    where exact counting is unaffordable. The estimate is min over the
    4 hashed counters, so est ≥ true always (pinned in tests);
    over_ppm quantifies collision damage per user.

    Unlike the HLL estimate (engine sketches differ; its key
    approx_distinct_counts is oracled via a within-band verdict), a CMS is
    DETERMINISTIC given its hash functions — md5-derived buckets make
    the whole sketch bit-identical in both engines, so this key is
    fully oracle-checked. Shape: the build is one map-side-combined
    groupBy on (row, bucket) — the exchange carries ≤ 4·1024 counter
    keys regardless of corpus size (sketches are mergeable: partial
    counters combine associatively, the whole point at 100 TB); the
    audit side joins the top-20 candidates' 4 hash rows against the
    BROADCAST sketch and takes one min per user. Integer ppm via div."""
    events = load_table(spark, sf_dir, "events").select("user_id")
    hashed = cms_hash_rows(events)
    sketch = hashed.groupBy("r", "b").agg(F.count("*").alias("counter"))
    top = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "user_id")
        .limit(CMS_TOP)
    )
    cand = top.select("user_id", "true_cnt").join(
        hashed.select("user_id", "r", "b").distinct(), "user_id"
    )
    return (
        cand.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("counter").alias("est_cnt"))
        .selectExpr(
            "user_id",
            "true_cnt",
            "est_cnt",
            "(est_cnt - true_cnt) * 1000000 div true_cnt AS over_ppm",
        )
    )


_LPA_ITERS = 3
_LPA_TOP = 30


def label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007, public) over the same customer–supplier trade graph
    as pagerank_fixed: every node starts as its own label; each of 3
    rounds, a node adopts the most frequent label among its neighbors
    (ties → smallest label — the deterministic variant, so the result
    is partitioning-independent and oracle-checkable, unlike the
    random-order original). Output: the 30 largest communities with
    member counts — the "which suppliers/customers trade in one
    cluster" question a mixing or sharding owner asks of a 100 TB
    order graph.

    Exactness: labels are BIGINT node ids and votes are integer
    counts end to end. Shape: per round, the persisted degree-free
    edge list shuffles onto src to meet the label frame, then a
    map-side-combined groupBy(dst, label) counts votes and a second
    combinable aggregate — min(struct(-count, label)) over dst —
    picks the argmax without any sort (interleaved ab_keys.py A/B vs
    the row_number-window formulation measured wall-time PARITY at
    sf0.1 — the win is structural: no per-round sort of the vote
    frame, which is what matters when votes stop fitting a task);
    the join exchange is
    the irreducible synchronous-LPA cost, same as PageRank's; the
    vote frame is community-bounded (nodes × distinct neighbor
    labels, collapsing every round), never corpus-shaped.
    Cache contract: the edge frame persists (MEMORY_AND_DISK, read
    once per round) and stays cached after the result materializes;
    long-lived callers call spark.catalog.clearCache() after
    consuming, as bench.py and tests/oracle_check.py do."""
    from pyspark.storagelevel import StorageLevel

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li.hint("merge"), F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    labels = (
        edges.select("src").distinct().select(F.col("src").alias("node"))
        .withColumn("label", F.col("node"))
    )
    for _ in range(_LPA_ITERS):
        votes = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst", "label")
            .agg(F.count("*").alias("c"))
        )
        # argmax-by-count, ties -> smallest label, as min(struct(-c,
        # label)) — a map-side-combinable aggregate instead of a
        # row_number window; drops the per-round sort (interleaved
        # A/B: wall-time parity at sf0.1, structural win at scale)
        labels = (
            votes.groupBy("dst")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("label"))
                ).alias("m")
            )
            .select(F.col("dst").alias("node"), F.col("m.label").alias("label"))
        )
    readable = F.when(
        F.col("label") % 2 == 0,
        F.concat(F.lit("c"), F.expr("label div 2")),
    ).otherwise(F.concat(F.lit("s"), F.expr("(label - 1) div 2")))
    return (
        labels.groupBy("label")
        .agg(
            F.count("*").alias("n_members"),
            F.sum((F.col("node") % 2 == 0).cast("long")).alias("n_customers"),
            F.sum((F.col("node") % 2 == 1).cast("long")).alias("n_suppliers"),
        )
        .orderBy(F.col("n_members").desc(), "label")
        .limit(_LPA_TOP)
        .select(readable.alias("community"), "n_members", "n_customers", "n_suppliers")
    )


def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell χ² association table between document language and
    source — the drift detector for "did source X suddenly change its
    language mix". Emits, for every (lang, source) cell, the observed
    count, the integer-e6 expected count, and the integer-e6 χ²
    contribution (O·N − R·C)²·10⁶ div (N·R·C).

    Exactness: no float expectation — the deviation (O·N − R·C) and
    its square run in DECIMAL (one operand cast before multiplying, so
    nothing wraps), and both e6 fixed-points use integer floor
    division. Shape: one combined groupBy(lang, source) builds the
    contingency table; row/column marginals are tiny aggregates of it
    that re-attach via broadcast — the corpus is scanned once."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count("*").alias("o"))
    row = obs.groupBy("lang").agg(F.sum("o").alias("r"))
    col = obs.groupBy("source").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("n"))
    cell = (
        obs.join(F.broadcast(row), "lang")
        .join(F.broadcast(col), "source")
        .crossJoin(F.broadcast(tot))
    )
    dev = F.col("o").cast("decimal(38,0)") * F.col("n") - F.col("r").cast(
        "decimal(38,0)"
    ) * F.col("c")
    return cell.select(
        "lang",
        "source",
        "o",
        # r·c·10⁶ overflows BIGINT at big-corpus marginals — decimal here too
        F.expr(
            "CAST((CAST(r AS DECIMAL(38,0)) * c * 1000000) div n AS BIGINT)"
        ).alias("expected_e6"),
        (dev * dev).cast("decimal(38,0)").alias("_d2"),
        F.col("n"),
        F.col("r"),
        F.col("c"),
    ).select(
        "lang",
        "source",
        "o",
        "expected_e6",
        F.expr(
            "CAST((_d2 * 1000000) div (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)"
        ).alias("chi2_e6"),
    )


_Z_BITS = 16  # bits per dimension interleaved into the Morton code


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout audit for the events table: interleave
    the low 16 bits of user_id with the low 16 bits of the epoch-minute
    into a 32-bit curve position, bucket by the top byte, and report
    each bucket's extent in BOTH dimensions. This is the layout a
    100 TB lake sorts/writes by so that min-max file statistics prune
    scans on user_id AND time simultaneously — the narrow per-bucket
    key/time ranges in the output ARE the data-skipping evidence.

    Pure bit arithmetic (shift/and/or), codegen'd in-row; one combined
    groupBy over 256 buckets. Identical in DuckDB, so the curve math
    is hash-verified rather than trusted. The corresponding WRITE path
    (materialize the layout the audit scores) is
    sources/files.py::write_zorder_layout."""
    from flinkproj_spark import functions as fx

    events = load_table(spark, sf_dir, "events")
    z = fx.morton2(
        F.col("user_id"),
        (F.unix_timestamp("ts") / 60).cast("long"),
        _Z_BITS,
    )
    coded = events.select(
        z.alias("zcode"),
        F.col("user_id").alias("uid"),
        (F.unix_timestamp("ts") / 60).cast("long").alias("minute"),
    )
    return (
        coded.groupBy(F.shiftright("zcode", 24).alias("zbucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("uid").alias("min_uid"),
            F.max("uid").alias("max_uid"),
            F.min("minute").alias("min_minute"),
            F.max("minute").alias("max_minute"),
        )
    )


def rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median of the event value per event_type: each
    event judged against the interpolated p50 of its 20 predecessors —
    the robust-baseline twin of anomaly_rolling_z (median shrugs off
    the outliers that inflate a rolling mean). Emitted with the same
    ≥10-history gate.

    Exactness: inputs are integer cents; `percentile` interpolates
    between two integers with one multiply-add, and both engines
    (Spark percentile, DuckDB quantile_cont) implement the same
    definition over the same ROWS frame and (ts, event_id) order, so
    the doubles agree bit-for-bit. One shuffle on event_type; the
    frame is ROWS-bounded so window state is O(1) per key."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-_ROLL_WIN, -1)
    )
    base = events.select(
        "event_id",
        "event_type",
        _cents("value").alias("v_c"),
        F.count("*").over(w).alias("n"),
        F.percentile(_cents("value"), F.lit(0.5)).over(w).alias("_med_c"),
    )
    return base.filter(F.col("n") >= _ROLL_MIN).select(
        "event_id",
        "event_type",
        "v_c",
        "n",
        F.round(F.col("_med_c") / F.lit(100.0), 6).alias("rolling_median"),
        (F.col("v_c").cast("double") > F.lit(2.0) * F.col("_med_c"))
        .cast("int").alias("above_2x_median"),
    )


def event_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift between event types: for every ordered pair
    (a < b), how many users did both, and the lift
    n_ab·N·10⁶ div (n_a·n_b) — >1e6 means the behaviors attract,
    <1e6 they repel. The cross-sell/affinity primitive over the
    behavioral log.

    Shape: one groupBy(user) collect_set of types (bounded by type
    cardinality, so the agg buffer is tiny and map-side combined),
    in-row ordered-pair expansion of the sorted set, a pair count,
    and the per-type marginals re-attached by broadcast (the type
    vocabulary is small by nature). Integer lift — DECIMAL casts keep
    n_ab·N·10⁶ exact at any user count."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("types")
    )
    pair_arr = F.flatten(
        F.transform(
            "types",
            lambda x, i: F.transform(
                F.slice(F.col("types"), i + F.lit(2), F.size("types")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pair_counts = (
        per_user.select(F.explode(pair_arr).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.count("*").alias("n_ab"))
    )
    marg = per_user.select(F.explode("types").alias("t")).groupBy("t").agg(
        F.count("*").alias("n_t")
    )
    n_users = per_user.agg(F.count("*").alias("n_users"))
    return (
        pair_counts.join(
            F.broadcast(marg.select(F.col("t").alias("a"), F.col("n_t").alias("n_a"))), "a"
        )
        .join(
            F.broadcast(marg.select(F.col("t").alias("b"), F.col("n_t").alias("n_b"))), "b"
        )
        .crossJoin(F.broadcast(n_users))
        .selectExpr(
            "a",
            "b",
            "n_ab",
            "n_a",
            "n_b",
            "n_users",
            "CAST((CAST(n_ab AS DECIMAL(38,0)) * n_users * 1000000)"
            " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) AS lift_e6",
        )
    )


_DRIFT_COLS = ("user_id", "event_type", "value", "props")


def schema_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot column-profile drift: for every payload
    column of the events table, compare the old half (ts < T0) with
    the new half — row counts, null-rate ppm, and exact distinct
    counts — one row per column. This is the ingest monitor that
    catches "the upstream started sending nulls" or "cardinality
    exploded" before a downstream join melts; the ppm deltas are what
    an alert thresholds on.

    Shape: ONE scan computes every profile in a single global
    aggregate using conditional aggregation (FILTER-style CASE inside
    count/count_distinct) — no per-column scan, no join between the
    halves; the per-column rows are then unpivoted from the one
    aggregate row with an in-row stack. Exact count_distinct is the
    honest default at audit cadence; swap approx_count_distinct for
    per-minute monitoring. Integer ppm arithmetic both engines."""
    events = load_table(spark, sf_dir, "events")
    old = F.col("ts") < F.lit(_IVM_T0)
    aggs = [
        F.sum(old.cast("long")).alias("n_old"),
        F.sum((~old).cast("long")).alias("n_new"),
    ]
    for c in _DRIFT_COLS:
        col = F.col(c)
        aggs += [
            F.sum((old & col.isNull()).cast("long")).alias(f"{c}__nulls_old"),
            F.sum(((~old) & col.isNull()).cast("long")).alias(f"{c}__nulls_new"),
            F.count_distinct(F.when(old, col)).alias(f"{c}__dist_old"),
            F.count_distinct(F.when(~old, col)).alias(f"{c}__dist_new"),
        ]
    one = events.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"{c}__nulls_old").alias("nulls_old"),
                    F.col(f"{c}__nulls_new").alias("nulls_new"),
                    F.col(f"{c}__dist_old").alias("dist_old"),
                    F.col(f"{c}__dist_new").alias("dist_new"),
                )
                for c in _DRIFT_COLS
            ]
        )
    )
    return (
        one.select("n_old", "n_new", per_col.alias("p"))
        .select("p.column", "n_old", "n_new", "p.nulls_old", "p.nulls_new",
                "p.dist_old", "p.dist_new")
        .selectExpr(
            "column",
            "n_old",
            "n_new",
            "(nulls_old * 1000000) div n_old AS null_ppm_old",
            "(nulls_new * 1000000) div n_new AS null_ppm_new",
            "dist_old",
            "dist_new",
        )
    )


_IVM_T0 = "2024-01-02 00:00:00"  # base-rollup / delta-batch boundary


def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a minute×event_type
    rollup is kept current by MERGING a delta batch's partial
    aggregates into the existing base rollup — never recomputing over
    history. This is the continuous-aggregate refresh every 100 TB
    deployment runs instead of full rebuilds: the base side is the
    stored rollup (bounded by bucket cardinality, not event count),
    and only the delta scans raw events.

    The merge is a full-outer join on the group key with coalesced
    SUM/SUM/MAX combination — valid because count, integer-cent sum,
    and max are all decomposable aggregates (partial ⊕ partial =
    total). The oracle states the CONTRACT: the merged view equals the
    rollup computed over ALL events from scratch — the invariant that
    makes incremental refresh trustworthy. Both engines integer-exact."""
    events = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss"

    def rollup(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.date_format(F.date_trunc("minute", "ts"), fmt).alias("bucket"),
                "event_type",
                _cents("value").alias("v_c"),
            )
            .groupBy("bucket", "event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum("v_c").alias("sum_c"),
                F.max("v_c").alias("max_c"),
            )
        )

    base = rollup(events.filter(F.col("ts") < F.lit(_IVM_T0)))
    delta = rollup(events.filter(F.col("ts") >= F.lit(_IVM_T0)))
    b = base.select(
        "bucket",
        "event_type",
        F.col("n").alias("b_n"),
        F.col("sum_c").alias("b_sum"),
        F.col("max_c").alias("b_max"),
    )
    merged = b.join(delta, ["bucket", "event_type"], "full_outer").select(
        "bucket",
        "event_type",
        (F.coalesce("b_n", F.lit(0)) + F.coalesce("n", F.lit(0))).alias("n"),
        (F.coalesce("b_sum", F.lit(0)) + F.coalesce("sum_c", F.lit(0))).alias(
            "_sum_c"
        ),
        F.greatest(
            F.coalesce("b_max", F.lit(-(1 << 62))),
            F.coalesce("max_c", F.lit(-(1 << 62))),
        ).alias("_max_c"),
    )
    return merged.select(
        "bucket",
        "event_type",
        "n",
        (F.col("_sum_c").cast("double") / F.lit(100.0)).alias("value_sum"),
        (F.col("_max_c").cast("double") / F.lit(100.0)).alias("value_max"),
    )



#: table -> profiled columns (ids, categoricals, small ints — the CBO
#: decision inputs; floats/arrays excluded from min/max-free profiling).
_ANALYZE_COLS = {
    "region": ("r_regionkey", "r_name"),
    "nation": ("n_nationkey", "n_name", "n_regionkey"),
    "customer": ("c_custkey", "c_nationkey", "c_mktsegment"),
    "supplier": ("s_suppkey", "s_nationkey"),
    "part": ("p_partkey", "p_brand", "p_type", "p_size"),
    "orders": ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
    "events": ("event_id", "user_id", "event_type", "props"),
    "documents": ("doc_id", "lang", "source", "n_chars"),
    "embeddings": ("vec_id", "label"),
}


def analyze_tables_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE for the whole star schema: one row per profiled
    (table, column) with row count, null count/ppm, and exact distinct
    count — the statistics a cost-based optimizer feeds on (join-side
    sizing, broadcast decisions, selectivity). This corpus carries no
    nulls, so the null columns pin ZERO (the planted-nulls test proves
    the counting path fires); the NDV column is fully live and is the
    one that drives plans.

    Shape: each table computes its whole profile in ONE aggregate row
    (count + per-column conditional null sums + count_distinct), then
    unpivots in-row with stack — one scan per table, no per-column
    scans, no joins; the ten 1-row aggregates union into a ~35-row
    report. Exact count_distinct is the audit-cadence choice; the
    sketch variant for continuous refresh is approx_distinct_counts.
    At 100 TB each profile is a single map-side-combinable pass whose
    exchange carries one partial row per partition."""
    out = None
    for table, cols in _ANALYZE_COLS.items():
        t = load_table(spark, sf_dir, table)
        aggs = [F.count("*").alias("_n")]
        for c in cols:
            aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
            aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__ndv"))
        one = t.agg(*aggs)
        stack = ", ".join(
            f"'{c}', {c}__nulls, {c}__ndv" for c in cols
        )
        rows = one.select(
            F.lit(table).alias("table_name"),
            F.col("_n").alias("n_rows"),
            F.expr(
                f"stack({len(cols)}, {stack}) AS (column_name, n_nulls, n_distinct)"
            ),
        ).withColumn("null_ppm", F.expr("n_nulls * 1000000 div n_rows"))
        out = rows if out is None else out.unionAll(rows)
    return out.select(
        "table_name", "column_name", "n_rows", "n_nulls", "n_distinct", "null_ppm"
    )



_BASKET_TOP = 30


def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-level market-basket analysis: the TOP 30 part pairs by
    co-purchase count, each with support and lift
    (n_ab·N·10⁶ div (n_a·n_b)) — the cross-sell primitive over actual
    baskets, complementing event_cooccurrence_lift's user-level twin.
    Lift > 1e6 means the parts attract (bought together beyond
    chance); ties rank deterministically by (count desc, part_a,
    part_b).

    Shape: one groupBy(order) collects the distinct sorted basket
    (baskets are order-bounded — single-digit items — so the agg
    buffer and the in-row C(k,2) pair expansion are tiny), one pair
    count, and part marginals re-attached by plain equi-joins (the
    part catalog is dimension-proportional, NOT broadcast by
    construction — AQE may broadcast at runtime when it fits). The
    lift numerator n_ab·N·10⁶ runs in DECIMAL(38,0), exact at any
    order count; top-k compiles to TakeOrderedAndProject, never a
    global sort."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pair_arr = F.flatten(
        F.transform(
            "parts",
            lambda x, i: F.transform(
                F.slice(F.col("parts"), i + F.lit(2), F.size("parts")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pair_counts = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("part_a"), F.col("p.b").alias("part_b"))
        .agg(F.count("*").alias("n_ab"))
    )
    marg = baskets.select(F.explode("parts").alias("t")).groupBy("t").agg(
        F.count("*").alias("n_t")
    )
    n_orders = baskets.agg(F.count("*").alias("n_orders"))
    joined = (
        pair_counts.join(
            marg.select(F.col("t").alias("part_a"), F.col("n_t").alias("n_a")),
            "part_a",
        )
        .join(
            marg.select(F.col("t").alias("part_b"), F.col("n_t").alias("n_b")),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    scored = joined.select(
        "part_a",
        "part_b",
        "n_ab",
        "n_a",
        "n_b",
        "n_orders",
        F.expr("n_ab * 1000000 div n_orders").alias("support_ppm"),
        F.expr(
            "CAST((CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000)"
            " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
        ).alias("lift_ppm"),
    )
    return scored.orderBy(
        F.col("n_ab").desc(), "part_a", "part_b"
    ).limit(_BASKET_TOP)



_CEP_WITHIN_US = 3 * 86400 * 1_000_000  # max gap per transition: 3 days


def cep_pattern_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP pattern matching — the Flink feature family the reference
    never used (SURVEY §2.9 lists CEP as an explicit gap) re-expressed
    Spark-first: detect every NON-OVERLAPPING view → click → purchase
    sequence per user where each transition happens within 3 days,
    with skip-till-next-match semantics (mid-pattern views are
    ignored, an overdue transition expires the partial match, a
    completed match resets the machine). One row per match with the
    three event times and the end-to-end duration — the per-match
    output funnel_steps' aggregate view cannot give.

    Shape: ONE exchange on user_id builds each user's time-ordered
    event array in-row (per-key timelines are activity-bounded, the
    same state-size argument as the streaming ring buffers; at 100 TB
    you sessionize first or run the streaming twin), then the greedy
    state machine runs as a codegen'd F.aggregate fold — stage,
    two timestamps, and the emitted matches ride one accumulator
    struct, no Python, no per-event shuffle. The DuckDB oracle walks
    the identical machine with a recursive CTE (depth = max events
    per user), so the exact greedy semantics are cross-checked, not
    just row counts. Timestamps are epoch MICROseconds end to end —
    no second-truncation ties, timezone-free."""
    events = load_table(spark, sf_dir, "events")
    evs = events.select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("ts"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("et"),
        ).alias("e"),
    ).groupBy("user_id").agg(F.sort_array(F.collect_list("e")).alias("evs"))
    W = _CEP_WITHIN_US
    eff = (
        "CASE WHEN (acc.stage = 1 AND e.ts - acc.t1 > {W})"
        "       OR (acc.stage = 2 AND e.ts - acc.t2 > {W}) THEN 0"
        "     ELSE acc.stage END"
    ).format(W=W)
    fold = f"""
      aggregate(
        evs,
        named_struct(
          'stage', 0,
          't1', CAST(0 AS BIGINT),
          't2', CAST(0 AS BIGINT),
          'ms', CAST(array() AS ARRAY<STRUCT<t1: BIGINT, t2: BIGINT, t3: BIGINT>>)),
        (acc, e) -> named_struct(
          'stage', CASE WHEN ({eff}) = 0 AND e.et = 'view' THEN 1
                        WHEN ({eff}) = 1 AND e.et = 'click' THEN 2
                        WHEN ({eff}) = 2 AND e.et = 'purchase' THEN 0
                        ELSE ({eff}) END,
          't1', CASE WHEN ({eff}) = 0 AND e.et = 'view' THEN e.ts ELSE acc.t1 END,
          't2', CASE WHEN ({eff}) = 1 AND e.et = 'click' THEN e.ts ELSE acc.t2 END,
          'ms', CASE WHEN ({eff}) = 2 AND e.et = 'purchase'
                     THEN concat(acc.ms, array(named_struct(
                            't1', acc.t1, 't2', acc.t2, 't3', e.ts)))
                     ELSE acc.ms END)
      ).ms
    """
    matched = evs.select("user_id", F.expr(fold).alias("ms"))
    out = matched.select(
        "user_id", F.posexplode("ms").alias("pos", "m")
    )
    return out.select(
        "user_id",
        (F.col("pos") + 1).cast("int").alias("match_seq"),
        F.col("m.t1").alias("t_view_us"),
        F.col("m.t2").alias("t_click_us"),
        F.col("m.t3").alias("t_purchase_us"),
        F.expr("(m.t3 - m.t1) div 1000000").alias("duration_sec"),
    )


QUERIES = {
    "cep_pattern_matches": cep_pattern_matches,
    "basket_pair_lift": basket_pair_lift,
    "analyze_tables_report": analyze_tables_report,
    "grouping_sets_counts": grouping_sets_counts,
    "time_rollup_multires": time_rollup_multires,
    "interval_join_pairs": interval_join_pairs,
    "percentile_stats": percentile_stats,
    "approx_percentile_stats": approx_percentile_stats,
    "histogram_value": histogram_value,
    "funnel_steps": funnel_steps,
    "retention_cohorts": retention_cohorts,
    "outlier_zscore": outlier_zscore,
    "event_path_topk": event_path_topk,
    "event_transition_matrix": event_transition_matrix,
    "anomaly_rolling_z": anomaly_rolling_z,
    "pagerank_fixed": pagerank_fixed,
    "label_propagation": label_propagation,
    "cms_heavy_hitters": cms_heavy_hitters,
    "chi2_lang_source": chi2_lang_source,
    "zorder_layout": zorder_layout,
    "incremental_rollup_merge": incremental_rollup_merge,
    "schema_drift_report": schema_drift_report,
    "rolling_median": rolling_median,
    "event_cooccurrence_lift": event_cooccurrence_lift,
}

_FUNNEL_SQL = """
        WITH u AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
          FROM events GROUP BY 1),
        u2 AS (
          SELECT e.user_id, u.t1,
                 MIN(CASE WHEN e.event_type = 'click' AND e.ts > u.t1
                          THEN e.ts END) AS t2
          FROM events e JOIN u USING (user_id) GROUP BY 1, 2),
        u3 AS (
          SELECT e.user_id, u2.t1, u2.t2,
                 MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > u2.t2
                          THEN e.ts END) AS t3
          FROM events e JOIN u2 USING (user_id) GROUP BY 1, 2, 3),
        agg AS (
          SELECT SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS n_view,
                 SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS n_view_click,
                 SUM(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS n_view_click_purchase
          FROM u3)
        SELECT CAST(n_view AS BIGINT) AS n_view,
               CAST(n_view_click AS BIGINT) AS n_view_click,
               CAST(n_view_click_purchase AS BIGINT) AS n_view_click_purchase,
               CAST(n_view_click * 100 // NULLIF(n_view, 0) AS BIGINT) AS pct_click,
               CAST(n_view_click_purchase * 100 // NULLIF(n_view, 0) AS BIGINT) AS pct_purchase
        FROM agg
"""

_RETENTION_SQL = """
        WITH acts AS (
          SELECT DISTINCT user_id,
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                      AS BIGINT) AS week
          FROM events),
        cohort AS (
          SELECT user_id, MIN(week) AS cohort_week FROM acts GROUP BY 1)
        SELECT c.cohort_week,
               a.week - c.cohort_week AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_users
        FROM acts a JOIN cohort c USING (user_id)
        GROUP BY 1, 2
"""

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
    # approx_percentile_stats: the GK estimate itself can't cross
    # engines (sketches differ), so the key outputs the exact
    # interpolated quantiles + the within-band verdict, which the
    # oracle pins to 1.
    "approx_percentile_stats": """
        SELECT c_mktsegment,
               COUNT(*) AS n_cust,
               ROUND(quantile_cont(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT), 0.5)
                     / 100.0, 6) AS median_bal,
               ROUND(quantile_cont(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT), 0.9)
                     / 100.0, 6) AS p90_bal,
               CAST(1 AS INT) AS gk_within_band
        FROM customer
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

ORACLE["funnel_steps"] = _FUNNEL_SQL
ORACLE["retention_cohorts"] = _RETENTION_SQL

# Mirrors outlier_zscore exactly: integer e4 moments, double math only
# in the final mean/var expressions (same shape, same rounding).
ORACLE["outlier_zscore"] = """
    WITH q AS (
      SELECT event_type,
             CAST(FLOOR("value" * 10000 + 0.5) AS BIGINT) AS v
      FROM events),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(v) AS s,
             SUM(CAST(v AS HUGEINT) * v) AS ss
      FROM q GROUP BY 1),
    enriched AS (
      SELECT event_type, n,
             CAST(s AS DOUBLE) / n AS m,
             sqrt(CAST(ss AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) AS sd
      FROM stats)
    SELECT q.event_type,
           CAST(MAX(e.n) AS BIGINT) AS n,
           MAX(ROUND(e.m / 10000.0, 4)) AS mean_value,
           MAX(ROUND(e.sd / 10000.0, 4)) AS std_value,
           CAST(SUM(CASE WHEN ABS(q.v - e.m) > 3.0 * e.sd THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM q JOIN enriched e USING (event_type)
    GROUP BY 1
"""

ORACLE["event_path_topk"] = f"""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    p AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= {_PATH_LEN} GROUP BY 1)
    SELECT path, COUNT(*) AS n_users
    FROM p GROUP BY 1
    ORDER BY n_users DESC, path LIMIT {_PATH_TOP}
"""

ORACLE["anomaly_rolling_z"] = f"""
    WITH v AS (
      SELECT event_id, event_type, ts,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
      FROM events),
    st AS (
      SELECT event_id, event_type, v_c,
             COUNT(v_c) OVER w AS n,
             CAST(SUM(v_c) OVER w AS BIGINT) AS s,
             SUM(CAST(v_c AS HUGEINT) * v_c) OVER w AS ss
      FROM v
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN {_ROLL_WIN} PRECEDING AND 1 PRECEDING))
    SELECT event_id, event_type, v_c, n, s,
           CAST((CAST(n AS HUGEINT) * v_c - s) * (CAST(n AS HUGEINT) * v_c - s)
                > 9 * (CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
                AS INT) AS is_anomaly
    FROM st WHERE n >= {_ROLL_MIN}
"""

_PR_BASE = _PR_SCALE * (_PR_DAMP_DEN - _PR_DAMP_NUM) // _PR_DAMP_DEN
_PR_ITER_SQL = "".join(
    f""",
    it{i + 1} AS (
      SELECT e.dst AS node,
             {_PR_BASE} + {_PR_DAMP_NUM} * SUM(r.rank // e.deg)
                          // {_PR_DAMP_DEN} AS rank
      FROM ed e JOIN it{i} r ON e.src = r.node
      GROUP BY 1)"""
    for i in range(_PR_ITERS)
)

ORACLE["pagerank_fixed"] = f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
    ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src),
    it0 AS (SELECT src AS node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM deg)
    {_PR_ITER_SQL}
    SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS BIGINT)
                ELSE 's' || CAST((node - 1) // 2 AS BIGINT) END AS node,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT node, rank FROM it{_PR_ITERS}
      ORDER BY rank DESC, node LIMIT {_PR_TOP})
"""

_LPA_ITER_SQL = "".join(
    f""",
    l{i + 1} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT e.dst AS node, r.label, COUNT(*) AS c,
               ROW_NUMBER() OVER (PARTITION BY e.dst
                                  ORDER BY COUNT(*) DESC, r.label) AS rn
        FROM edges e JOIN l{i} r ON e.src = r.node
        GROUP BY e.dst, r.label)
      WHERE rn = 1)"""
    for i in range(_LPA_ITERS)
)

ORACLE["label_propagation"] = f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS MATERIALIZED (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs),
    l0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, src AS label FROM edges)
    {_LPA_ITER_SQL}
    SELECT CASE WHEN label % 2 = 0 THEN 'c' || CAST(label // 2 AS BIGINT)
                ELSE 's' || CAST((label - 1) // 2 AS BIGINT) END AS community,
           n_members, n_customers, n_suppliers
    FROM (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_customers,
             CAST(SUM(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_suppliers
      FROM l{_LPA_ITERS} GROUP BY 1
      ORDER BY n_members DESC, label LIMIT {_LPA_TOP})
"""

ORACLE["chi2_lang_source"] = """
    WITH obs AS (
      SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2),
    r AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1),
    c AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs)
    SELECT obs.lang, obs.source, obs.o,
           CAST((CAST(r.r AS HUGEINT) * c.c * 1000000) // n.n AS BIGINT)
             AS expected_e6,
           CAST(((CAST(obs.o AS HUGEINT) * n.n - CAST(r.r AS HUGEINT) * c.c)
                 * (CAST(obs.o AS HUGEINT) * n.n - CAST(r.r AS HUGEINT) * c.c)
                 * 1000000)
                // (CAST(n.n AS HUGEINT) * r.r * c.c) AS BIGINT) AS chi2_e6
    FROM obs
    JOIN r ON obs.lang = r.lang
    JOIN c ON obs.source = c.source
    CROSS JOIN n
"""

_Z_INTERLEAVE_SQL = " | ".join(
    f"(((u >> {i}) & 1) << {2 * i}) | (((m >> {i}) & 1) << {2 * i + 1})"
    for i in range(_Z_BITS)
)

ORACLE["zorder_layout"] = f"""
    WITH sec AS (
      -- integer seconds FIRST: DuckDB's // on DOUBLE operands does not
      -- floor, so epoch(ts)//60 followed by a (rounding) BIGINT cast
      -- lands in the next minute for fractions > .5
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
    coded AS (
      SELECT ({_Z_INTERLEAVE_SQL}) AS zcode,
             user_id AS uid,
             s // 60 AS minute
      FROM (
        SELECT user_id & {(1 << _Z_BITS) - 1} AS u,
               (s // 60) & {(1 << _Z_BITS) - 1} AS m,
               user_id, s
        FROM sec))
    SELECT CAST(zcode >> 24 AS BIGINT) AS zbucket,
           COUNT(*) AS n_events,
           MIN(uid) AS min_uid, MAX(uid) AS max_uid,
           MIN(minute) AS min_minute, MAX(minute) AS max_minute
    FROM coded GROUP BY 1
"""

# The invariant, not the mechanism: merged(base, delta) must equal the
# rollup over ALL events computed from scratch.
ORACLE["incremental_rollup_merge"] = """
    SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS value_sum,
           CAST(MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS value_max
    FROM events GROUP BY 1, 2
"""


ORACLE["schema_drift_report"] = f"""
    WITH e AS (SELECT *, ts < TIMESTAMP '{_IVM_T0}' AS old FROM events),
    a AS (
      SELECT CAST(SUM(CASE WHEN old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
             CAST(SUM(CASE WHEN NOT old THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        CAST(SUM(CASE WHEN old AND user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id__nulls_old,
        CAST(SUM(CASE WHEN NOT old AND user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id__nulls_new,
        COUNT(DISTINCT CASE WHEN old THEN user_id END) AS user_id__dist_old,
        COUNT(DISTINCT CASE WHEN NOT old THEN user_id END) AS user_id__dist_new,
        CAST(SUM(CASE WHEN old AND event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type__nulls_old,
        CAST(SUM(CASE WHEN NOT old AND event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type__nulls_new,
        COUNT(DISTINCT CASE WHEN old THEN event_type END) AS event_type__dist_old,
        COUNT(DISTINCT CASE WHEN NOT old THEN event_type END) AS event_type__dist_new,
        CAST(SUM(CASE WHEN old AND value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value__nulls_old,
        CAST(SUM(CASE WHEN NOT old AND value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value__nulls_new,
        COUNT(DISTINCT CASE WHEN old THEN value END) AS value__dist_old,
        COUNT(DISTINCT CASE WHEN NOT old THEN value END) AS value__dist_new,
        CAST(SUM(CASE WHEN old AND props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props__nulls_old,
        CAST(SUM(CASE WHEN NOT old AND props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props__nulls_new,
        COUNT(DISTINCT CASE WHEN old THEN props END) AS props__dist_old,
        COUNT(DISTINCT CASE WHEN NOT old THEN props END) AS props__dist_new
      FROM e)
    
      SELECT 'user_id' AS "column", n_old, n_new,
             (user_id__nulls_old * 1000000) // n_old AS null_ppm_old,
             (user_id__nulls_new * 1000000) // n_new AS null_ppm_new,
             user_id__dist_old AS dist_old, user_id__dist_new AS dist_new
      FROM a UNION ALL 
      SELECT 'event_type' AS "column", n_old, n_new,
             (event_type__nulls_old * 1000000) // n_old AS null_ppm_old,
             (event_type__nulls_new * 1000000) // n_new AS null_ppm_new,
             event_type__dist_old AS dist_old, event_type__dist_new AS dist_new
      FROM a UNION ALL 
      SELECT 'value' AS "column", n_old, n_new,
             (value__nulls_old * 1000000) // n_old AS null_ppm_old,
             (value__nulls_new * 1000000) // n_new AS null_ppm_new,
             value__dist_old AS dist_old, value__dist_new AS dist_new
      FROM a UNION ALL 
      SELECT 'props' AS "column", n_old, n_new,
             (props__nulls_old * 1000000) // n_old AS null_ppm_old,
             (props__nulls_new * 1000000) // n_new AS null_ppm_new,
             props__dist_old AS dist_old, props__dist_new AS dist_new
      FROM a
"""

ORACLE["rolling_median"] = f"""
    WITH v AS (
      SELECT event_id, event_type, ts,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
      FROM events),
    st AS (
      SELECT event_id, event_type, v_c,
             COUNT(*) OVER w AS n,
             quantile_cont(v_c, 0.5) OVER w AS med_c
      FROM v
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN {_ROLL_WIN} PRECEDING AND 1 PRECEDING))
    SELECT event_id, event_type, v_c, n,
           ROUND(med_c / 100.0, 6) AS rolling_median,
           CAST(CAST(v_c AS DOUBLE) > 2.0 * med_c AS INT) AS above_2x_median
    FROM st WHERE n >= {_ROLL_MIN}
"""

ORACLE["event_cooccurrence_lift"] = """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
    m AS (SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY 1),
    p AS (
      SELECT x.event_type AS a, y.event_type AS b, COUNT(*) AS n_ab
      FROM ut x JOIN ut y
        ON x.user_id = y.user_id AND x.event_type < y.event_type
      GROUP BY 1, 2)
    SELECT p.a, p.b, p.n_ab,
           ma.n_t AS n_a, mb.n_t AS n_b,
           CAST(n.n_users AS BIGINT) AS n_users,
           CAST((CAST(p.n_ab AS HUGEINT) * n.n_users * 1000000)
                // (CAST(ma.n_t AS HUGEINT) * mb.n_t) AS BIGINT) AS lift_e6
    FROM p
    JOIN m ma ON p.a = ma.event_type
    JOIN m mb ON p.b = mb.event_type
    CROSS JOIN n
"""

_CMS_BK = " UNION ALL ".join(
    f"SELECT user_id, {r} AS r, ('0x' || substr(md5('cms{r}:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % {CMS_W} AS b FROM events"
    for r in range(CMS_D)
)

ORACLE["cms_heavy_hitters"] = f"""
    WITH hashed AS MATERIALIZED ({_CMS_BK}),
    sketch AS MATERIALIZED (
      SELECT r, b, COUNT(*) AS counter FROM hashed GROUP BY 1, 2),
    top AS MATERIALIZED (
      SELECT user_id, COUNT(*) AS true_cnt FROM events
      GROUP BY 1 ORDER BY true_cnt DESC, user_id LIMIT {CMS_TOP})
    SELECT t.user_id, CAST(t.true_cnt AS BIGINT) AS true_cnt,
           CAST(MIN(s.counter) AS BIGINT) AS est_cnt,
           CAST((MIN(s.counter) - t.true_cnt) * 1000000 // t.true_cnt
                AS BIGINT) AS over_ppm
    FROM top t
    JOIN (SELECT DISTINCT user_id, r, b FROM hashed) h USING (user_id)
    JOIN sketch s USING (r, b)
    GROUP BY t.user_id, t.true_cnt
"""

ORACLE["event_transition_matrix"] = """
    WITH steps AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    trans AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n_trans
      FROM steps WHERE prev_type IS NOT NULL
      GROUP BY 1, 2),
    totals AS (SELECT prev_type, SUM(n_trans) AS row_total FROM trans GROUP BY 1)
    SELECT t.prev_type, t.next_type, CAST(t.n_trans AS BIGINT) AS n_trans,
           CAST(t.n_trans * 1000000 // x.row_total AS BIGINT) AS p_ppm
    FROM trans t JOIN totals x USING (prev_type)
"""

ORACLE["analyze_tables_report"] = "\nUNION ALL\n".join(
    f"""
    SELECT '{table}' AS table_name, '{col}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // COUNT(*) AS null_ppm
    FROM {table}"""
    for table, cols in _ANALYZE_COLS.items()
    for col in cols
)


ORACLE["basket_pair_lift"] = f"""
    WITH b AS (
      SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS parts
      FROM lineitem GROUP BY 1),
    pairs AS (
      SELECT unnest(flatten(list_transform(parts,
               (x, i) -> list_transform(parts[i+1:], y -> [x, y])))) AS p
      FROM b),
    pc AS (
      SELECT p[1] AS part_a, p[2] AS part_b, COUNT(*) AS n_ab
      FROM pairs GROUP BY 1, 2),
    marg AS (
      SELECT t, COUNT(*) AS n_t
      FROM (SELECT unnest(parts) AS t FROM b) GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_orders FROM b)
    SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(ma.n_t AS BIGINT) AS n_a, CAST(mb.n_t AS BIGINT) AS n_b,
           CAST(n.n_orders AS BIGINT) AS n_orders,
           CAST(n_ab AS BIGINT) * 1000000 // n.n_orders AS support_ppm,
           CAST(CAST(n_ab AS HUGEINT) * n.n_orders * 1000000
                // (CAST(ma.n_t AS HUGEINT) * mb.n_t) AS BIGINT) AS lift_ppm
    FROM pc
    JOIN marg ma ON ma.t = pc.part_a
    JOIN marg mb ON mb.t = pc.part_b
    CROSS JOIN n
    ORDER BY n_ab DESC, part_a, part_b LIMIT {_BASKET_TOP}
"""


def _cep_oracle() -> str:
    W = _CEP_WITHIN_US
    eff = (
        f"CASE WHEN (w.stage = 1 AND s.ts - w.t1 > {W})"
        f"       OR (w.stage = 2 AND s.ts - w.t2 > {W}) THEN 0"
        f"     ELSE w.stage END"
    )
    return f"""
    WITH RECURSIVE seq AS (
      SELECT user_id, epoch_us(ts) AS ts, event_type AS et,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events),
    walk(user_id, rn, stage, t1, t2, m_t1, m_t2, m_t3) AS (
      SELECT user_id, 0, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
      FROM (SELECT DISTINCT user_id FROM seq)
      UNION ALL
      SELECT w.user_id, w.rn + 1,
             CASE WHEN ({eff}) = 0 AND s.et = 'view' THEN 1
                  WHEN ({eff}) = 1 AND s.et = 'click' THEN 2
                  WHEN ({eff}) = 2 AND s.et = 'purchase' THEN 0
                  ELSE ({eff}) END,
             CASE WHEN ({eff}) = 0 AND s.et = 'view' THEN s.ts ELSE w.t1 END,
             CASE WHEN ({eff}) = 1 AND s.et = 'click' THEN s.ts ELSE w.t2 END,
             CASE WHEN ({eff}) = 2 AND s.et = 'purchase' THEN w.t1 END,
             CASE WHEN ({eff}) = 2 AND s.et = 'purchase' THEN w.t2 END,
             CASE WHEN ({eff}) = 2 AND s.et = 'purchase' THEN s.ts END
      FROM walk w JOIN seq s ON s.user_id = w.user_id AND s.rn = w.rn + 1)
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY m_t3) AS INT)
             AS match_seq,
           m_t1 AS t_view_us, m_t2 AS t_click_us, m_t3 AS t_purchase_us,
           (m_t3 - m_t1) // 1000000 AS duration_sec
    FROM walk WHERE m_t3 IS NOT NULL
"""


ORACLE["cep_pattern_matches"] = _cep_oracle()


# ---------------------------------------------------------------------------
# EWMA daily anomaly monitor (round 7)
# ---------------------------------------------------------------------------

# Truncated-EWMA weights, alpha = 1/4 over the 8 prior days, held as
# exact integers scaled by 4^8: w_j = 3^(j-1) * 4^(8-j) for lag j in
# 1..8.  Their sum is the telescoped 4^8 - 3^8 = 58975, so
# `n * EWMA_WSUM` and the weighted lag sum live on the same scale and
# the deviation test is pure BIGINT — no float smoothing state, no
# cross-engine drift.
EWMA_WEIGHTS = tuple(3 ** (j - 1) * 4 ** (8 - j) for j in range(1, 9))
EWMA_WSUM = 4**8 - 3**8  # 58975
EWMA_FLAG_PCT = 20  # flag when |n - ewma| > 20% of ewma


def ewma_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily volume anomaly: an exponentially weighted
    moving average (alpha=1/4, truncated at 8 days) of the PRIOR days'
    counts, and a flag where today deviates more than 20% from it —
    the classic ops-dashboard "volume looks wrong" alarm, exact.

    The reference has no anomaly surface at all (SURVEY.md §2.9 — no
    analytic windows); this is the standing monitor a training-data
    ingest pipeline runs per source/type.

    Shape: one groupBy collapses the fact scan to the |types| x |days|
    dimension frame (map-side combined), and the 8 lags run as ONE
    Window pass partitioned by event_type over that tiny frame — the
    window never sees fact rows, so the sort is bounded by the
    calendar, not the data. EWMA state is an integer linear form
    (weights scaled by 4^8), so partial-agg order never changes a
    bit. At 100 TB the daily frame is still |types| x |days| rows.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "day",
        "n",
        *[F.lag("n", j).over(w).alias(f"_l{j}") for j in range(1, 9)],
    )
    ewma = sum(
        F.col(f"_l{j}") * F.lit(wt) for j, wt in enumerate(EWMA_WEIGHTS, start=1)
    )
    dev = F.col("n") * F.lit(EWMA_WSUM) - F.col("_ewma")
    return (
        lagged.filter(F.col("_l8").isNotNull())
        .withColumn("_ewma", ewma.cast("long"))
        .select(
            "event_type",
            "day",
            F.col("n").cast("long").alias("n"),
            F.col("_ewma").alias("ewma_num"),
            dev.cast("long").alias("dev_num"),
            (F.abs(dev) * 100 > F.lit(EWMA_FLAG_PCT) * F.col("_ewma"))
            .cast("int")
            .alias("flagged"),
        )
    )


QUERIES["ewma_daily_anomaly"] = ewma_daily_anomaly
_EWMA_TERMS = " + ".join(
    f"l{j} * {wt}" for j, wt in enumerate(EWMA_WEIGHTS, start=1)
)
_EWMA_LAGS = ", ".join(f"lag(c, {j}) OVER w AS l{j}" for j in range(1, 9))
ORACLE["ewma_daily_anomaly"] = f"""
    WITH d AS (
      SELECT event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS dday,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    l AS (
      SELECT event_type, dday, c, {_EWMA_LAGS}
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY dday)),
    e AS (
      SELECT event_type, dday, c, {_EWMA_TERMS} AS ewma_num
      FROM l WHERE l8 IS NOT NULL)
    SELECT event_type, dday AS day, CAST(c AS BIGINT) AS n,
           CAST(ewma_num AS BIGINT) AS ewma_num,
           CAST(c * {EWMA_WSUM} - ewma_num AS BIGINT) AS dev_num,
           CAST(CASE WHEN ABS(c * {EWMA_WSUM} - ewma_num) * 100
                          > {EWMA_FLAG_PCT} * ewma_num
                     THEN 1 ELSE 0 END AS INT) AS flagged
    FROM e
"""


# ---------------------------------------------------------------------------
# k-anonymity privacy audit (round 7)
# ---------------------------------------------------------------------------

K_ANON_QIDS = ("c_nationkey", "c_mktsegment")
K_ANON_KS = (2, 10, 100, 300)  # k=2/10/100 split live at sf0.001/0.01/0.1


def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifiers
    (nation, market segment): for each candidate k, how many QID
    equivalence classes fall below k members and how many rows those
    classes expose — the release-gate check a privacy review runs
    before sharing a derived table.

    Shape: ONE groupBy collapses the table to its QID-class frame
    (bounded by the QID domain product, not row count), then the
    4-row k list joins in as a broadcast and a second tiny aggregate
    produces the per-k report. The fact table is scanned once and
    only (nation, segment) columns are read — at 100 TB the class
    frame is still |nations| x |segments| rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(*K_ANON_QIDS).agg(F.count("*").alias("gsz"))
    ks = spark.createDataFrame([(k,) for k in K_ANON_KS], "k int")
    below = F.col("gsz") < F.col("k")
    return (
        classes.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.sum("gsz").cast("long").alias("n_rows"),
            F.sum(below.cast("long")).alias("n_classes_below"),
            F.coalesce(F.sum(F.when(below, F.col("gsz"))), F.lit(0))
            .cast("long")
            .alias("n_rows_at_risk"),
            F.min("gsz").cast("long").alias("min_class_size"),
        )
        .select(
            "k",
            "n_classes",
            "n_rows",
            "n_classes_below",
            "n_rows_at_risk",
            "min_class_size",
        )
    )


QUERIES["k_anonymity_report"] = k_anonymity_report
ORACLE["k_anonymity_report"] = f"""
    WITH classes AS (
      SELECT {', '.join(K_ANON_QIDS)}, COUNT(*) AS gsz
      FROM customer GROUP BY {', '.join(str(i + 1) for i in range(len(K_ANON_QIDS)))}),
    ks AS (SELECT unnest([{', '.join(str(k) for k in K_ANON_KS)}]) AS k)
    SELECT CAST(k AS INT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(gsz) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN gsz < k THEN 1 ELSE 0 END) AS BIGINT)
             AS n_classes_below,
           CAST(COALESCE(SUM(CASE WHEN gsz < k THEN gsz END), 0) AS BIGINT)
             AS n_rows_at_risk,
           CAST(MIN(gsz) AS BIGINT) AS min_class_size
    FROM classes CROSS JOIN ks
    GROUP BY k
"""


# ---------------------------------------------------------------------------
# Signup→purchase conversion-lag curve (round 7)
# ---------------------------------------------------------------------------


def conversion_lag_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival-style conversion curve: for users whose first purchase
    follows their first signup, the day-offset histogram and the
    cumulative share of the signup cohort converted by each offset —
    the activation-latency chart growth teams watch (KM curve with
    no censoring beyond the corpus horizon).

    Shape: two conditional aggregates collapse the fact scan to one
    row per user (map-side combined), the purchase stream joins the
    signup frame on user_id (one hash exchange — at 100 TB this is
    the only data-sized shuffle), and the curve itself is a window
    over the DAY-OFFSET histogram, whose row count is bounded by the
    calendar. The cohort size rides a broadcast 1-row aggregate.
    """
    events = load_table(spark, sf_dir, "events")
    signup = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    conv = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .join(signup, "user_id")
        .filter(F.col("ts") >= F.col("st"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"), F.min("st").alias("st"))
        .select(F.datediff(F.to_date("pt"), F.to_date("st")).alias("lag_days"))
    )
    hist = conv.groupBy("lag_days").agg(F.count("*").alias("n_at"))
    cohort = signup.agg(F.count("*").alias("cohort_n"))
    w = Window.orderBy("lag_days").rowsBetween(Window.unboundedPreceding, 0)
    return (
        hist.withColumn("cum_converted", F.sum("n_at").over(w))
        .crossJoin(F.broadcast(cohort))
        .select(
            F.col("lag_days").cast("int").alias("lag_days"),
            F.col("n_at").cast("long").alias("n_at"),
            F.col("cum_converted").cast("long").alias("cum_converted"),
            F.col("cohort_n").cast("long").alias("cohort_n"),
            F.expr("cum_converted * 1000000 div cohort_n").alias("conv_ppm"),
        )
    )


QUERIES["conversion_lag_curve"] = conversion_lag_curve
ORACLE["conversion_lag_curve"] = """
    WITH s AS (
      SELECT user_id, MIN(ts) AS st FROM events
      WHERE event_type = 'signup' GROUP BY 1),
    conv AS (
      SELECT date_diff('day', CAST(MIN(s.st) AS DATE), CAST(MIN(e.ts) AS DATE))
               AS lag_days
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= s.st
      GROUP BY e.user_id),
    hist AS (SELECT lag_days, COUNT(*) AS n_at FROM conv GROUP BY 1),
    cohort AS (SELECT COUNT(*) AS cohort_n FROM s)
    SELECT CAST(lag_days AS INT) AS lag_days,
           CAST(n_at AS BIGINT) AS n_at,
           CAST(SUM(n_at) OVER (ORDER BY lag_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_converted,
           CAST(cohort_n AS BIGINT) AS cohort_n,
           CAST(SUM(n_at) OVER (ORDER BY lag_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             * 1000000 // cohort_n AS conv_ppm
    FROM hist CROSS JOIN cohort
"""


# ---------------------------------------------------------------------------
# Exact OLS monthly trend fit (round 7)
# ---------------------------------------------------------------------------


def ols_trend_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer OLS trend fit of monthly revenue (cents) against
    the month index: per month, the observed revenue, the fitted value
    from the least-squares line, and the residual — the trend/seasonal
    decomposition primitive a forecasting pipeline starts from. The
    partial trailing month surfaces as a huge negative residual, which
    is exactly the data-quality signal the residual column is for.

    All arithmetic is exact: slope = num/den is carried as a BIGINT
    rational (num = n*Sdxdy - Sdx*Sdy, den = n*Sdxdx - Sdx^2), and the
    fitted value is the single truncating division
    (den*Sdy + num*(n*dx - Sdx)) div (n*den) + cy over DECIMAL(38,0)
    products (Spark `div` on decimals truncates toward zero exactly
    like DuckDB HUGEINT //; its LONG result is safe because the
    quotient is a monthly-revenue-sized number). Covariance is
    shift-invariant, so both x and y are first pivoted by their
    integer floor-means — at 100 TB the deviation sums stay bounded by
    n*max_deviation instead of n*max_value, which is what keeps the
    products inside 128-bit no matter how many months or how large the
    revenue.

    Shape: ONE data-sized pass (map-side-combined groupBy month on two
    read columns); everything after operates on the months frame
    (80 rows here, thousands at most ever) with 1-row broadcast
    pivots/statistics — no second scan, no driver loop.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month_ym"),
        (
            (F.year("o_orderdate") - F.lit(1995)) * 12
            + F.month("o_orderdate")
            - 1
        )
        .cast("long")
        .alias("mi"),
    ).agg(F.sum(_cents("o_totalprice")).alias("rev_c"))
    pivots = monthly.agg(
        F.count("*").alias("n"),
        F.expr("sum(mi) div count(*)").alias("cx"),
        F.expr("sum(rev_c) div count(*)").alias("cy"),
    )
    dev = monthly.crossJoin(F.broadcast(pivots)).select(
        "month_ym", "mi", "rev_c", "n", "cx", "cy",
        (F.col("mi") - F.col("cx")).alias("dx"),
        (F.col("rev_c") - F.col("cy")).alias("dy"),
    )
    stats = dev.groupBy("n", "cy").agg(
        F.sum("dx").alias("sdx"),
        F.sum("dy").alias("sdy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sdxdy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sdxdx"),
    ).select(
        "n", "cy", "sdx", "sdy",
        (F.col("n") * F.col("sdxdy") - F.col("sdx") * F.col("sdy")).alias(
            "slope_num"
        ),
        (F.col("n") * F.col("sdxdx") - F.col("sdx") * F.col("sdx")).alias(
            "slope_den"
        ),
    )
    fitted = (
        "cy + CAST((CAST(slope_den AS DECIMAL(38,0)) * CAST(sdy AS DECIMAL(38,0))"
        " + CAST(slope_num AS DECIMAL(38,0))"
        "   * CAST(n * dx - sdx AS DECIMAL(38,0)))"
        " div (CAST(n AS DECIMAL(38,0)) * CAST(slope_den AS DECIMAL(38,0)))"
        " AS BIGINT)"
    )
    return (
        dev.select("month_ym", "mi", "rev_c", "dx")
        .crossJoin(F.broadcast(stats))
        .select(
            "month_ym",
            F.col("mi").cast("long").alias("mi"),
            F.col("rev_c").cast("long").alias("rev_c"),
            F.expr(fitted).alias("fitted_c"),
            (F.col("rev_c") - F.expr(fitted)).cast("long").alias("resid_c"),
            F.col("n").cast("long").alias("n"),
            F.col("slope_num").cast("long").alias("slope_num"),
            F.col("slope_den").cast("long").alias("slope_den"),
            F.expr("slope_num div slope_den").alias("slope_c_per_month"),
        )
    )


QUERIES["ols_trend_monthly"] = ols_trend_monthly
ORACLE["ols_trend_monthly"] = """
    WITH monthly AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month_ym,
             (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS mi,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1, 2),
    pivots AS (
      SELECT COUNT(*) AS n, SUM(mi) // COUNT(*) AS cx,
             SUM(rev_c) // COUNT(*) AS cy
      FROM monthly),
    dev AS (
      SELECT m.*, p.n, p.cx, p.cy, m.mi - p.cx AS dx, m.rev_c - p.cy AS dy
      FROM monthly m CROSS JOIN pivots p),
    stats AS (
      SELECT n, cy, SUM(dx) AS sdx, SUM(dy) AS sdy,
             n * SUM(dx * dy) - SUM(dx) * SUM(dy) AS slope_num,
             n * SUM(dx * dx) - SUM(dx) * SUM(dx) AS slope_den
      FROM dev GROUP BY 1, 2)
    SELECT d.month_ym,
           CAST(d.mi AS BIGINT) AS mi,
           CAST(d.rev_c AS BIGINT) AS rev_c,
           CAST(s.cy + (CAST(s.slope_den AS HUGEINT) * s.sdy
                        + CAST(s.slope_num AS HUGEINT) * (s.n * d.dx - s.sdx))
                       // (CAST(s.n AS HUGEINT) * s.slope_den) AS BIGINT)
             AS fitted_c,
           CAST(d.rev_c - (s.cy + (CAST(s.slope_den AS HUGEINT) * s.sdy
                        + CAST(s.slope_num AS HUGEINT) * (s.n * d.dx - s.sdx))
                       // (CAST(s.n AS HUGEINT) * s.slope_den)) AS BIGINT)
             AS resid_c,
           CAST(s.n AS BIGINT) AS n,
           CAST(s.slope_num AS BIGINT) AS slope_num,
           CAST(s.slope_den AS BIGINT) AS slope_den,
           CAST(s.slope_num // s.slope_den AS BIGINT) AS slope_c_per_month
    FROM dev d CROSS JOIN stats s
"""


def corr_pairs_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation report over document metric pairs —
    (chars, words), (words, distinct words), and a (chars, doc_id%7)
    null control that pins the statistic's discrimination: the real
    pairs score high corr2_ppm, the control scores ~0. Everything is
    integer-exact: with centered sums num = n*Sdxdy - Sdx*Sdy and
    den_x = n*Sdxdx - Sdx^2, corr^2 = num^2/(den_x*den_y) exactly, so
    corr2_ppm = num^2 * 1e6 div (den_x * den_y) is order-independent
    and engine-identical (no float sqrt — the sign rides separately).

    Shape: ONE documents scan computes the per-doc metric row; a
    3-way stack unpivots it to (pair, x, y) so all pairs share one
    map-side-combined groupBy(pair). Pivoting x and y by their integer
    floor-means first (shift-invariance of covariance) bounds every
    product by n*max_DEVIATION^2, which is what keeps the DECIMAL(38)
    squares in range at any corpus size; the per-pair pivot/stat
    frames are 3 rows and ride broadcasts.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    m = docs.select(
        F.col("n_chars").cast("long").alias("nc"),
        F.size(words).cast("long").alias("nw"),
        F.size(F.array_distinct(words)).cast("long").alias("nd"),
        (F.col("doc_id") % 7).cast("long").alias("null7"),
    )
    pairs = m.select(
        F.expr(
            "stack(3, 'chars_words', nc, nw,"
            " 'words_distinct', nw, nd,"
            " 'chars_null7', nc, null7) AS (pair, x, y)"
        )
    )
    pivots = pairs.groupBy("pair").agg(
        F.count("*").alias("n"),
        F.expr("sum(x) div count(*)").alias("cx"),
        F.expr("sum(y) div count(*)").alias("cy"),
    )
    dev = pairs.join(F.broadcast(pivots), "pair").select(
        "pair", "n",
        (F.col("x") - F.col("cx")).alias("dx"),
        (F.col("y") - F.col("cy")).alias("dy"),
    )
    stats = dev.groupBy("pair", "n").agg(
        F.sum("dx").alias("sdx"),
        F.sum("dy").alias("sdy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sdxdy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sdxdx"),
        F.sum(F.col("dy") * F.col("dy")).alias("sdydy"),
    )
    return stats.select(
        "pair",
        F.col("n").cast("long").alias("n"),
        F.expr("n * sdxdy - sdx * sdy").alias("cov_num"),
        F.expr("n * sdxdx - sdx * sdx").alias("varx_num"),
        F.expr("n * sdydy - sdy * sdy").alias("vary_num"),
        F.expr(
            "CAST((CAST(n * sdxdy - sdx * sdy AS DECIMAL(38,0))"
            " * CAST(n * sdxdy - sdx * sdy AS DECIMAL(38,0))"
            " * CAST(1000000 AS DECIMAL(38,0)))"
            " div (CAST(n * sdxdx - sdx * sdx AS DECIMAL(38,0))"
            "      * CAST(n * sdydy - sdy * sdy AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("corr2_ppm"),
        F.signum(F.expr("n * sdxdy - sdx * sdy")).cast("int").alias("corr_sign"),
    )


QUERIES["corr_pairs_report"] = corr_pairs_report
ORACLE["corr_pairs_report"] = """
    WITH m AS (
      SELECT CAST(n_chars AS BIGINT) AS nc,
             CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                  AS BIGINT) AS nw,
             CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                                w -> w <> ''))) AS BIGINT)
               AS nd,
             CAST(doc_id % 7 AS BIGINT) AS null7
      FROM documents),
    pairs AS (
      SELECT 'chars_words' AS pair, nc AS x, nw AS y FROM m
      UNION ALL SELECT 'words_distinct', nw, nd FROM m
      UNION ALL SELECT 'chars_null7', nc, null7 FROM m),
    pivots AS (
      SELECT pair, COUNT(*) AS n, SUM(x) // COUNT(*) AS cx,
             SUM(y) // COUNT(*) AS cy
      FROM pairs GROUP BY 1),
    dev AS (
      SELECT p.pair, v.n, p.x - v.cx AS dx, p.y - v.cy AS dy
      FROM pairs p JOIN pivots v USING (pair)),
    stats AS (
      SELECT pair, n, SUM(dx) AS sdx, SUM(dy) AS sdy,
             SUM(dx * dy) AS sdxdy, SUM(dx * dx) AS sdxdx,
             SUM(dy * dy) AS sdydy
      FROM dev GROUP BY 1, 2)
    SELECT pair,
           CAST(n AS BIGINT) AS n,
           CAST(n * sdxdy - sdx * sdy AS BIGINT) AS cov_num,
           CAST(n * sdxdx - sdx * sdx AS BIGINT) AS varx_num,
           CAST(n * sdydy - sdy * sdy AS BIGINT) AS vary_num,
           CAST(CAST(n * sdxdy - sdx * sdy AS HUGEINT)
                * CAST(n * sdxdy - sdx * sdy AS HUGEINT) * 1000000
                // (CAST(n * sdxdx - sdx * sdx AS HUGEINT)
                    * CAST(n * sdydy - sdy * sdy AS HUGEINT)) AS BIGINT)
             AS corr2_ppm,
           CAST(CASE WHEN n * sdxdy - sdx * sdy > 0 THEN 1
                     WHEN n * sdxdy - sdx * sdy < 0 THEN -1
                     ELSE 0 END AS INT) AS corr_sign
    FROM stats
"""


# QID for the l-diversity audit: nation x account-balance band (a
# 2000.00-wide bucket of exact cents); sensitive attribute = segment.
L_DIV_QID_BUCKET_C = 200_000
L_DIV_LS = (2, 3, 4, 5)


def l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al.) — the step AFTER
    k-anonymity: a QID class can be large yet still leak the sensitive
    attribute if every member shares one value. Per candidate l, how
    many (nation, balance-band) classes carry fewer than l distinct
    market segments, how many rows those classes expose, and the
    corpus-wide minimum diversity. The nation-only QID is saturated
    (every nation has all 5 segments — verified before wiring); the
    balance band is what makes the audit live.

    Shape: one scan → groupBy QID with countDistinct(sensitive) (the
    two-phase distinct aggregate; class frame bounded by the QID
    domain, not rows), then the 4-row l list joins in as a broadcast
    — same release-gate shape as k_anonymity_report, sharing its
    scale argument."""
    cust = load_table(spark, sf_dir, "customer")
    bal_b = F.expr(
        f"CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) div {L_DIV_QID_BUCKET_C}"
    )
    classes = cust.groupBy(
        F.col("c_nationkey").alias("nat"),
        bal_b.alias("bal_b"),
    ).agg(
        F.count("*").alias("gsz"),
        F.countDistinct("c_mktsegment").alias("ldiv"),
    )
    ls = spark.createDataFrame([(l,) for l in L_DIV_LS], "l int")
    below = F.col("ldiv") < F.col("l")
    return (
        classes.crossJoin(F.broadcast(ls))
        .groupBy("l")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.sum(below.cast("long")).alias("n_classes_below"),
            F.coalesce(F.sum(F.when(below, F.col("gsz"))), F.lit(0))
            .cast("long")
            .alias("n_rows_at_risk"),
            F.min("ldiv").cast("long").alias("min_l"),
        )
        .select("l", "n_classes", "n_classes_below", "n_rows_at_risk", "min_l")
    )


QUERIES["l_diversity_report"] = l_diversity_report
ORACLE["l_diversity_report"] = f"""
    WITH classes AS (
      SELECT c_nationkey AS nat,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
               // {L_DIV_QID_BUCKET_C} AS bal_b,
             COUNT(*) AS gsz,
             COUNT(DISTINCT c_mktsegment) AS ldiv
      FROM customer GROUP BY 1, 2),
    ls AS (SELECT unnest([{', '.join(str(l) for l in L_DIV_LS)}]) AS l)
    SELECT CAST(l AS INT) AS l,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN ldiv < l THEN 1 ELSE 0 END) AS BIGINT)
             AS n_classes_below,
           CAST(COALESCE(SUM(CASE WHEN ldiv < l THEN gsz END), 0) AS BIGINT)
             AS n_rows_at_risk,
           CAST(MIN(ldiv) AS BIGINT) AS min_l
    FROM classes CROSS JOIN ls
    GROUP BY l
"""


def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event value per user (TWAP): each
    observation is held until the next one, so its weight is the gap
    to the successor in whole epoch seconds, and the average is the
    exact rational sum(value_c * dt_s) / span_s — the metric that makes
    irregular event streams comparable (a plain AVG over-counts burst
    periods; TWAP is duration-faithful). The trailing observation
    carries no weight (nothing is held after it); single-event users
    have no span and are excluded by the n >= 2 predicate.

    All integer-exact: cents x whole seconds (unix_micros div 1e6 on
    both engines — identical truncation by construction), one
    truncating division at the end. Per-term bound is
    max_value_cents * user_span_s, so the per-user sum stays far
    inside int64 for any realistic retention window.

    Shape: ONE corpus pass; the lead() window partitions by user (key-
    bounded partitions — the same contract as sessionize/rolling), the
    groupBy(user) that follows reuses the exchange AQE already placed
    for the window, and output is one row per multi-event user."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        F.expr("unix_micros(ts) div 1000000").alias("t_s"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
    ).withColumn("next_t", F.lead("t_s").over(w))
    return (
        seq.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.max("t_s") - F.min("t_s")).cast("long").alias("span_s"),
            F.sum(
                F.when(
                    F.col("next_t").isNotNull(),
                    F.col("vc") * (F.col("next_t") - F.col("t_s")),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("twsum"),
        )
        .filter(F.col("n_events") >= 2)
        .select(
            "user_id",
            "n_events",
            "span_s",
            "twsum",
            F.expr("twsum div span_s").alias("twap_c"),
        )
    )


QUERIES["twap_user_value"] = twap_user_value
ORACLE["twap_user_value"] = """
    WITH seq AS (
      SELECT user_id,
             epoch_us(ts) // 1000000 AS t_s,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
             LEAD(epoch_us(ts) // 1000000)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_t
      FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(t_s) - MIN(t_s) AS BIGINT) AS span_s,
           CAST(SUM(CASE WHEN next_t IS NOT NULL
                         THEN vc * (next_t - t_s) ELSE 0 END) AS BIGINT)
             AS twsum,
           CAST(SUM(CASE WHEN next_t IS NOT NULL
                         THEN vc * (next_t - t_s) ELSE 0 END)
                // (MAX(t_s) - MIN(t_s)) AS BIGINT) AS twap_c
    FROM seq
    GROUP BY user_id
    HAVING COUNT(*) >= 2
"""




def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer, recency (days since
    last order, against the corpus max order date), frequency (order
    count), monetary (lifetime spend in exact cents), each scored into
    quintiles 1-5 (5 = best: most recent / most frequent / highest
    spend), plus the concatenated RFM code marketing pipelines key on.

    Quintile boundaries are NOT ntile() (whose remainder distribution
    is engine lore): the score is the closed form
    q = (rank-1)*5 div n + 1 over a fully tie-broken rank
    ((metric, custkey) total order), so both engines derive identical
    buckets by construction.

    Shape: one orders scan -> groupBy(custkey) collapses to the
    CUSTOMER-DIMENSION frame; the max-order-date scalar and the n
    scalar ride 1-row broadcasts; the three quintile ranks are each the
    skew-safe two-pass bucketed row_number (functions.
    bucketed_row_number — round-8 generalization of the
    quality_rank_per_lang pattern): recency buckets by 16-day calendar
    ranges, frequency by 4-order ranges, monetary by 2^24-cent ranges,
    so every unpartitioned window runs over a bucket-COUNT frame
    bounded by the metric's DOMAIN (calendar span / order-count range /
    money range), never by |customers| — a naive Window.orderBy would
    sort the whole customer dimension in one task at 100×. At 100 TB
    the orders scan is the only data-sized stage."""
    from flinkproj_spark.functions import bucketed_row_number

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.to_date("o_orderdate")).alias("last_d"),
        F.count("*").cast("long").alias("f_n"),
        F.sum(_cents("o_totalprice")).alias("m_c"),
    )
    horizon = orders.agg(F.max(F.to_date("o_orderdate")).alias("h"))
    base = per_cust.crossJoin(F.broadcast(horizon)).select(
        "custkey",
        F.datediff(F.col("h"), F.col("last_d")).cast("long").alias("r_days"),
        "f_n",
        "m_c",
    )
    counted = base.crossJoin(F.broadcast(base.agg(F.count("*").alias("n"))))
    ranked = bucketed_row_number(
        counted,
        F.expr("r_days div 16"),
        [F.col("r_days").desc(), F.col("custkey").asc()],  # oldest first
        "rn_r",
        descending=True,
    )
    ranked = bucketed_row_number(
        ranked,
        F.expr("f_n div 4"),
        [F.col("f_n").asc(), F.col("custkey").asc()],
        "rn_f",
    )
    ranked = bucketed_row_number(
        ranked,
        F.expr("m_c div 16777216"),
        [F.col("m_c").asc(), F.col("custkey").asc()],
        "rn_m",
    )
    return ranked.select(
        "custkey",
        "r_days",
        "f_n",
        "m_c",
        F.expr("(rn_r - 1) * 5 div n + 1").alias("r_q"),
        F.expr("(rn_f - 1) * 5 div n + 1").alias("f_q"),
        F.expr("(rn_m - 1) * 5 div n + 1").alias("m_q"),
        F.expr(
            "CAST((rn_r - 1) * 5 div n + 1 AS STRING)"
            " || CAST((rn_f - 1) * 5 div n + 1 AS STRING)"
            " || CAST((rn_m - 1) * 5 div n + 1 AS STRING)"
        ).alias("rfm_code"),
    )


QUERIES["rfm_segmentation"] = rfm_segmentation
ORACLE["rfm_segmentation"] = """
    WITH per_cust AS (
      SELECT o_custkey AS custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_d,
             COUNT(*) AS f_n,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS m_c
      FROM orders GROUP BY 1),
    horizon AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS h FROM orders),
    base AS (
      SELECT custkey, date_diff('day', last_d, h) AS r_days, f_n, m_c,
             COUNT(*) OVER () AS n
      FROM per_cust CROSS JOIN horizon),
    ranked AS (
      SELECT *,
        (ROW_NUMBER() OVER (ORDER BY r_days DESC, custkey) - 1) * 5 // n + 1 AS r_q,
        (ROW_NUMBER() OVER (ORDER BY f_n ASC, custkey) - 1) * 5 // n + 1 AS f_q,
        (ROW_NUMBER() OVER (ORDER BY m_c ASC, custkey) - 1) * 5 // n + 1 AS m_q
      FROM base)
    SELECT custkey, CAST(r_days AS BIGINT) AS r_days,
           CAST(f_n AS BIGINT) AS f_n, CAST(m_c AS BIGINT) AS m_c,
           CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
           CAST(m_q AS BIGINT) AS m_q,
           CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR) ||
             CAST(m_q AS VARCHAR) AS rfm_code
    FROM ranked
"""




def customer_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers are cohorted by first-
    order month; for each (cohort, age-in-months) cell the cohort's
    revenue at that age, the running cumulative revenue, and the
    cumulative LTV per cohort member in exact cents — the money twin
    of retention_cohorts (which counts activity; this one prices it).

    Shape: groupBy(custkey) derives each customer's cohort month
    (customer-dimension frame), joined back to orders on the custkey
    hash exchange (both sides corpus/dimension-proportional — a
    broadcast would cap scale); the (cohort, age) rollup is then
    map-side combined and every later stage (cumulative window
    partitioned by cohort, cohort-size join) runs on the cohort x age
    grid, bounded by months^2, not rows."""
    orders = load_table(spark, sf_dir, "orders")
    om = orders.select(
        "o_custkey",
        ((F.year("o_orderdate") - F.lit(1995)) * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("mi"),
        _cents("o_totalprice").alias("rev_c"),
    )
    first = om.groupBy("o_custkey").agg(F.min("mi").alias("cohort_mi"))
    sizes = first.groupBy("cohort_mi").agg(
        F.count("*").cast("long").alias("cohort_n")
    )
    cells = (
        om.join(first, "o_custkey")
        .groupBy("cohort_mi", (F.col("mi") - F.col("cohort_mi")).alias("age_m"))
        .agg(F.sum("rev_c").alias("rev_c"))
    )
    w = (
        Window.partitionBy("cohort_mi")
        .orderBy("age_m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.withColumn("cum_rev_c", F.sum("rev_c").over(w))
        .join(F.broadcast(sizes), "cohort_mi")
        .select(
            F.col("cohort_mi").cast("long").alias("cohort_mi"),
            F.col("age_m").cast("long").alias("age_m"),
            F.col("rev_c").cast("long").alias("rev_c"),
            F.col("cum_rev_c").cast("long").alias("cum_rev_c"),
            "cohort_n",
            F.expr("cum_rev_c div cohort_n").alias("ltv_c_per_cust"),
        )
    )


QUERIES["customer_ltv_cohort"] = customer_ltv_cohort
ORACLE["customer_ltv_cohort"] = """
    WITH om AS (
      SELECT o_custkey,
             (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS mi,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS rev_c
      FROM orders),
    first_o AS (SELECT o_custkey, MIN(mi) AS cohort_mi FROM om GROUP BY 1),
    sizes AS (SELECT cohort_mi, COUNT(*) AS cohort_n FROM first_o GROUP BY 1),
    cells AS (
      SELECT f.cohort_mi, o.mi - f.cohort_mi AS age_m, SUM(o.rev_c) AS rev_c
      FROM om o JOIN first_o f USING (o_custkey)
      GROUP BY 1, 2),
    cum AS (
      SELECT cohort_mi, age_m, rev_c,
             SUM(rev_c) OVER (PARTITION BY cohort_mi ORDER BY age_m
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_rev_c
      FROM cells)
    SELECT CAST(c.cohort_mi AS BIGINT) AS cohort_mi,
           CAST(c.age_m AS BIGINT) AS age_m,
           CAST(c.rev_c AS BIGINT) AS rev_c,
           CAST(c.cum_rev_c AS BIGINT) AS cum_rev_c,
           CAST(s.cohort_n AS BIGINT) AS cohort_n,
           CAST(c.cum_rev_c // s.cohort_n AS BIGINT) AS ltv_c_per_cust
    FROM cum c JOIN sizes s USING (cohort_mi)
"""


def seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar seasonality profile on top of the OLS trend fit: the
    detrended residuals of ols_trend_monthly, grouped by calendar
    month (Jan..Dec), as an exact ppm share of the pivot revenue —
    trend/seasonal decomposition's second step. A flat profile (this
    corpus) is itself the finding: monthly revenue deviations carry
    no calendar structure, so a forecaster needs no seasonal term.

    Shape: everything downstream of the one data-sized pass inside
    ols_trend_monthly runs on the 80-row months frame; this adds one
    12-row aggregate to that plan."""
    fit = ols_trend_monthly(spark, sf_dir)
    cy = fit.agg(
        (F.sum("rev_c") - F.sum("resid_c")).alias("fit_total"),
        F.count("*").alias("n_months"),
    )
    return (
        fit.groupBy((F.col("mi") % 12).cast("int").alias("cal_month"))
        .agg(
            F.count("*").cast("long").alias("n_m"),
            F.sum("resid_c").cast("long").alias("sum_resid_c"),
        )
        .crossJoin(F.broadcast(cy))
        .select(
            "cal_month",
            "n_m",
            "sum_resid_c",
            F.expr(
                "CAST(CAST(sum_resid_c AS DECIMAL(38,0)) * 1000000 * n_months"
                " div (CAST(n_m AS DECIMAL(38,0)) * fit_total) AS BIGINT)"
            ).alias("seas_ppm"),
        )
    )


QUERIES["seasonality_profile"] = seasonality_profile


def benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-numbers screen: per leading digit, the observed count
    and ppm share against the Benford expectation ppm (fixed integer
    constants of floor(log10(1+1/d)*1e6), identical literals in both
    engines — no runtime logarithms). TPC-H-style uniform pricing is
    NOT Benford-distributed, and the report shows exactly that — the
    audit firing on synthetic data is the audit working.

    Shape: one scan, first digit extracted from the cents BIGINT's
    decimal string (no float log), map-side-combined groupBy on a
    9-value key, total rides a broadcast 1-row aggregate."""
    benford = spark.createDataFrame(
        list(BENFORD_PPM.items()), "digit string, benford_ppm long"
    )
    orders = load_table(spark, sf_dir, "orders")
    counts = (
        orders.select(
            F.substring(_cents("o_totalprice").cast("string"), 1, 1).alias(
                "digit"
            )
        )
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .join(F.broadcast(benford), "digit")
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.expr("n * 1000000 div total").alias("share_ppm"),
            "benford_ppm",
            F.expr("n * 1000000 div total - benford_ppm").alias("dev_ppm"),
        )
    )


# floor(log10(1 + 1/d) * 1e6) — Benford first-digit expectation, ppm.
BENFORD_PPM = {
    "1": 301029, "2": 176091, "3": 124938, "4": 96910, "5": 79181,
    "6": 66946, "7": 57991, "8": 51152, "9": 45757,
}

QUERIES["benford_deviation"] = benford_deviation


def gini_revenue_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the Lorenz curve by customer-spend decile
    plus the exact-integer Gini coefficient in ppm — "what share of
    revenue do the bottom k/10 of customers carry". Gini uses the
    rank identity G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over
    the fully tie-broken (spend, custkey) ascending order; deciles use
    the same closed-form bucketing as rfm_segmentation.

    Shape: the orders scan collapses to the customer-dimension spend
    frame; the rank is the skew-safe two-pass bucketed row_number
    (functions.bucketed_row_number, the quality_rank_per_lang pattern
    generalized in round 8) — the spend axis is cut into fixed 2^24-cent
    ranges, so the only unpartitioned window runs over the BUCKET-COUNT
    frame (spend-range/2^24 rows, money-domain-bounded, never
    |customers|) and the per-customer sort happens within buckets. A
    naive Window.orderBy here would sort billions of customers in one
    task at 100×. Products route through DECIMAL(38)/HUGEINT so
    rank*spend sums stay exact at any customer count."""
    from flinkproj_spark.functions import bucketed_row_number

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(_cents("o_totalprice")).alias("m_c")
    )
    ranked = bucketed_row_number(
        spend,
        F.expr("m_c div 16777216"),
        [F.col("m_c").asc(), F.col("custkey").asc()],
        "rk",
    )
    tot = ranked.agg(
        F.count("*").alias("n"),
        F.sum("m_c").alias("sum_m"),
        F.sum(
            F.col("rk").cast("decimal(38,0)") * F.col("m_c").cast("decimal(38,0)")
        ).alias("sum_rx"),
    )
    deciles = (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy(F.expr("(rk - 1) * 10 div n + 1").alias("decile"))
        .agg(
            F.count("*").cast("long").alias("n_cust"),
            F.sum("m_c").cast("long").alias("dec_m_c"),
            F.first("n").alias("n"),
            F.first("sum_m").alias("sum_m"),
            F.first("sum_rx").alias("sum_rx"),
        )
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        deciles.withColumn("cum_m_c", F.sum("dec_m_c").over(wc))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_cust",
            "dec_m_c",
            F.col("cum_m_c").cast("long").alias("cum_m_c"),
            F.expr(
                "CAST(CAST(cum_m_c AS DECIMAL(38,0)) * 1000000"
                " div CAST(sum_m AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("cum_share_ppm"),
            F.expr(
                "CAST((2 * sum_rx - (CAST(n AS DECIMAL(38,0)) + 1)"
                " * CAST(sum_m AS DECIMAL(38,0))) * 1000000"
                " div (CAST(n AS DECIMAL(38,0)) * CAST(sum_m AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ).alias("gini_ppm"),
        )
    )


QUERIES["gini_revenue_lorenz"] = gini_revenue_lorenz

ORACLE["seasonality_profile"] = f"""
    WITH ols AS ({ORACLE["ols_trend_monthly"]}),
    cy AS (SELECT SUM(rev_c) - SUM(resid_c) AS fit_total,
                  COUNT(*) AS n_months FROM ols)
    SELECT CAST(mi % 12 AS INT) AS cal_month,
           CAST(COUNT(*) AS BIGINT) AS n_m,
           CAST(SUM(resid_c) AS BIGINT) AS sum_resid_c,
           CAST(CAST(SUM(resid_c) AS HUGEINT) * 1000000 * n_months
                // (CAST(COUNT(*) AS HUGEINT) * fit_total) AS BIGINT)
             AS seas_ppm
    FROM ols CROSS JOIN cy
    GROUP BY 1, fit_total, n_months
"""

ORACLE["benford_deviation"] = f"""
    WITH benford(digit, benford_ppm) AS (VALUES
      {', '.join(f"('{d}', {p})" for d, p in BENFORD_PPM.items())}),
    counts AS (
      SELECT substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                         AS VARCHAR), 1, 1) AS digit,
             COUNT(*) AS n
      FROM orders GROUP BY 1),
    tot AS (SELECT SUM(n) AS total FROM counts)
    SELECT c.digit,
           CAST(c.n AS BIGINT) AS n,
           CAST(c.n * 1000000 // t.total AS BIGINT) AS share_ppm,
           CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
           CAST(c.n * 1000000 // t.total - b.benford_ppm AS BIGINT) AS dev_ppm
    FROM counts c CROSS JOIN tot t JOIN benford b USING (digit)
"""

ORACLE["gini_revenue_lorenz"] = """
    WITH spend AS (
      SELECT o_custkey AS custkey,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS m_c
      FROM orders GROUP BY 1),
    ranked AS (
      SELECT custkey, m_c,
             ROW_NUMBER() OVER (ORDER BY m_c ASC, custkey) AS rk
      FROM spend),
    tot AS (
      SELECT COUNT(*) AS n, SUM(m_c) AS sum_m,
             SUM(CAST(rk AS HUGEINT) * m_c) AS sum_rx
      FROM ranked),
    deciles AS (
      SELECT (rk - 1) * 10 // n + 1 AS decile,
             COUNT(*) AS n_cust, SUM(m_c) AS dec_m_c,
             ANY_VALUE(n) AS n, ANY_VALUE(sum_m) AS sum_m,
             ANY_VALUE(sum_rx) AS sum_rx
      FROM ranked CROSS JOIN tot
      GROUP BY 1)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_cust AS BIGINT) AS n_cust,
           CAST(dec_m_c AS BIGINT) AS dec_m_c,
           CAST(SUM(dec_m_c) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_m_c,
           CAST(CAST(SUM(dec_m_c) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
                * 1000000 // sum_m AS BIGINT) AS cum_share_ppm,
           CAST((2 * sum_rx - (CAST(n AS HUGEINT) + 1) * sum_m) * 1000000
                // (CAST(n AS HUGEINT) * sum_m) AS BIGINT) AS gini_ppm
    FROM deciles
"""


def moment_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape report per document source: exact integer
    central-moment sums and the shape ratios screening pipelines
    compare across ingest feeds — population kurtosis
    kurt_ppm = M4*1e6 div M2^2 (the n's cancel: M2 = n*S2-S1^2,
    M3 = n^2*S3-3n*S1*S2+2*S1^3, M4 = n^3*S4-4n^2*S1*S3+6n*S1^2*S2
    -3*S1^4 over mean-pivot deviations satisfy mu4/mu2^2 = M4/M2^2
    exactly), and squared skewness via the two-step truncating
    evaluation t = M3*1e3 div M2; skew2_ppm = t^2*1e6 div (M2*1e6)
    (== g1^2*1e6 up to the one truncation at t — relative error
    ~1e-9 here, and both engines compute the identical integer). Sign
    rides separately (no sqrt anywhere). Bound: products stay inside
    128-bit while n*max_deviation^2 < ~1e18 per group; past that,
    moment sums are exactly mergeable (they're sums), so the
    production path is per-shard partials + pairwise combine, not a
    wider integer.

    Shape: one scan -> groupBy(source) for integer floor-mean pivots
    (source-dimension frame, broadcast back), one more
    map-side-combined groupBy over deviations, then arithmetic on the
    tiny per-source frame."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    pivots = docs.groupBy("source").agg(
        F.expr("sum(x) div count(*)").alias("cx")
    )
    dev = docs.join(F.broadcast(pivots), "source").select(
        "source", "cx", (F.col("x") - F.col("cx")).alias("dx")
    )
    s = dev.groupBy("source", "cx").agg(
        F.count("*").alias("n"),
        F.sum("dx").alias("s1"),
        F.sum(F.expr("dx * dx")).alias("s2"),
        F.sum(F.expr("dx * dx * dx")).alias("s3"),
        F.sum(F.expr("dx * dx * dx * dx")).alias("s4"),
    )
    m = s.select(
        "source",
        F.col("n").cast("long").alias("n"),
        F.expr("cx + s1 div n").alias("mean_chars"),
        F.expr("n * s2 - s1 * s1").alias("m2"),
        F.expr("n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1").alias("m3"),
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * n * n * s4"
            " - 4 * CAST(n AS DECIMAL(38,0)) * n * s1 * s3"
            " + 6 * CAST(n AS DECIMAL(38,0)) * s1 * s1 * s2"
            " - 3 * CAST(s1 AS DECIMAL(38,0)) * s1 * s1 * s1"
        ).alias("m4d"),
    )
    return m.select(
        "source",
        "n",
        "mean_chars",
        "m2",
        "m3",
        F.expr(
            "CAST(CAST(m3 AS DECIMAL(38,0)) * 1000 div CAST(m2 AS DECIMAL(38,0))"
            " AS DECIMAL(38,0))"
        ).alias("_t"),
        F.signum("m3").cast("int").alias("skew_sign"),
        F.expr("CAST(m4d * 1000000 div (CAST(m2 AS DECIMAL(38,0)) * m2) AS BIGINT)").alias(
            "kurt_ppm"
        ),
    ).select(
        "source",
        "n",
        "mean_chars",
        "m2",
        "m3",
        F.expr(
            "CAST(_t * _t * 1000000 div (CAST(m2 AS DECIMAL(38,0)) * 1000000)"
            " AS BIGINT)"
        ).alias("skew2_ppm"),
        "skew_sign",
        "kurt_ppm",
    )


QUERIES["moment_stats_by_source"] = moment_stats_by_source
ORACLE["moment_stats_by_source"] = """
    WITH docs AS (
      SELECT source, CAST(n_chars AS BIGINT) AS x FROM documents),
    pivots AS (
      SELECT source, SUM(x) // COUNT(*) AS cx FROM docs GROUP BY 1),
    dev AS (
      SELECT d.source, p.cx, d.x - p.cx AS dx
      FROM docs d JOIN pivots p USING (source)),
    s AS (
      SELECT source, cx, COUNT(*) AS n, SUM(dx) AS s1,
             SUM(dx * dx) AS s2, SUM(dx * dx * dx) AS s3,
             SUM(dx * dx * dx * dx) AS s4
      FROM dev GROUP BY 1, 2),
    m AS (
      SELECT source, n, cx + s1 // n AS mean_chars,
             n * s2 - s1 * s1 AS m2,
             n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS m3,
             CAST(n AS HUGEINT) * n * n * s4
               - 4 * CAST(n AS HUGEINT) * n * s1 * s3
               + 6 * CAST(n AS HUGEINT) * s1 * s1 * s2
               - 3 * CAST(s1 AS HUGEINT) * s1 * s1 * s1 AS m4h
      FROM s)
    SELECT source,
           CAST(n AS BIGINT) AS n,
           CAST(mean_chars AS BIGINT) AS mean_chars,
           CAST(m2 AS BIGINT) AS m2,
           CAST(m3 AS BIGINT) AS m3,
           CAST((CAST(m3 AS HUGEINT) * 1000 // m2)
                * (CAST(m3 AS HUGEINT) * 1000 // m2) * 1000000
                // (CAST(m2 AS HUGEINT) * 1000000) AS BIGINT) AS skew2_ppm,
           CAST(CASE WHEN m3 > 0 THEN 1 WHEN m3 < 0 THEN -1 ELSE 0 END
                AS INT) AS skew_sign,
           CAST(m4h * 1000000 // (CAST(m2 AS HUGEINT) * m2) AS BIGINT)
             AS kurt_ppm
    FROM m
"""



ACF_LAGS = (1, 2, 3, 7, 14, 28)


def autocorr_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact autocorrelation function of daily revenue at the classic
    lags (1,2,3 days; 1,2,4 weeks): acf_ppm(k) = 1e6 * sum((y_t-c)
    *(y_{t+k}-c)) div sum((y_t-c)^2) over the integer floor-mean pivot
    c — near-zero everywhere on this corpus (orders are i.i.d. across
    days), which is exactly the finding that licenses the i.i.d.
    assumption the forecasting family (OLS trend, EWMA) rests on.
    Denominator uses the full series; the lag product pairs (t, t+k)
    via an equi-join on the day index, so no window function at all.

    Shape: ONE data-sized pass (groupBy day); the day grid (~2.4k
    rows) then self-joins on di+k per broadcast lag — grid-sized work;
    pivot and denominator ride 1-row broadcasts. Deviation products
    bound everything by n_days*max_dev^2 (shift-invariance again)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01"))
        .cast("long")
        .alias("di")
    ).agg(F.sum(_cents("o_totalprice")).alias("rev_c"))
    pivot = daily.agg(
        F.expr("sum(rev_c) div count(*)").alias("cy"),
        F.count("*").alias("n_days"),
    )
    dev = daily.crossJoin(F.broadcast(pivot)).select(
        "di", (F.col("rev_c") - F.col("cy")).alias("dy"), "n_days"
    )
    den = dev.agg(
        F.sum(F.expr("CAST(dy AS DECIMAL(38,0)) * dy")).alias("s_dd")
    )
    lags = spark.createDataFrame([(k,) for k in ACF_LAGS], "lag int")
    pairs = (
        dev.crossJoin(F.broadcast(lags))
        .withColumn("di_next", F.col("di") + F.col("lag"))
        .alias("l")
        .join(
            dev.select(F.col("di").alias("di_next"), F.col("dy").alias("dy2")),
            "di_next",
        )
    )
    return (
        pairs.groupBy("lag", "n_days")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.expr("CAST(dy AS DECIMAL(38,0)) * dy2")).alias("s_lag"),
        )
        .crossJoin(F.broadcast(den))
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.col("n_days").cast("long").alias("n_days"),
            "n_pairs",
            F.expr("CAST(s_lag * 1000000 div s_dd AS BIGINT)").alias(
                "acf_ppm"
            ),
        )
    )


QUERIES["autocorr_daily_revenue"] = autocorr_daily_revenue
ORACLE["autocorr_daily_revenue"] = f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS di,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1),
    piv AS (SELECT SUM(rev_c) // COUNT(*) AS cy, COUNT(*) AS n_days
            FROM daily),
    dev AS (SELECT di, rev_c - cy AS dy, n_days FROM daily CROSS JOIN piv),
    den AS (SELECT SUM(CAST(dy AS HUGEINT) * dy) AS s_dd FROM dev),
    lags AS (SELECT unnest([{', '.join(str(k) for k in ACF_LAGS)}]) AS lag)
    SELECT CAST(l.lag AS INT) AS lag,
           CAST(ANY_VALUE(a.n_days) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(a.dy AS HUGEINT) * b.dy) * 1000000
                // ANY_VALUE(d.s_dd) AS BIGINT) AS acf_ppm
    FROM dev a CROSS JOIN lags l
    JOIN dev b ON b.di = a.di + l.lag
    CROSS JOIN den d
    GROUP BY l.lag
"""


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift scan over daily revenue: the running sum of
    deviations from the integer pivot mean, its absolute peak flagged
    as the changepoint candidate, and each day's |cusum| as a share of
    the peak — the classic Page-style drift detector. On this corpus
    the curve is a random walk whose flagged peak carries no external
    shift — the near-uniform ppm plateau around the peak says
    "no structural break", which is the detector's honest output here.

    Shape: one data-sized pass to the day grid; the cumulative sum
    runs over the ~2.4k-row date grid (plan-lint whitelisted global
    window over a date-bounded frame); peak extraction is a 1-row
    broadcast aggregate of the same grid."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01"))
        .cast("long")
        .alias("di")
    ).agg(F.sum(_cents("o_totalprice")).alias("rev_c"))
    pivot = daily.agg(
        F.expr("sum(rev_c) div count(*)").alias("cy"),
        F.count("*").alias("n_days"),
    )
    w = Window.orderBy("di").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        daily.crossJoin(F.broadcast(pivot))
        .withColumn("cusum_c", F.sum(F.col("rev_c") - F.col("cy")).over(w))
        .select("di", "rev_c", "cusum_c")
    )
    peak = cum.agg(F.max(F.abs("cusum_c")).alias("peak_abs"))
    peak_di = (
        cum.crossJoin(F.broadcast(peak))
        .filter(F.abs("cusum_c") == F.col("peak_abs"))
        .agg(F.min("di").alias("peak_di"), F.min("peak_abs").alias("peak_abs"))
    )
    return (
        cum.crossJoin(F.broadcast(peak_di))
        .select(
            "di",
            F.col("rev_c").cast("long").alias("rev_c"),
            F.col("cusum_c").cast("long").alias("cusum_c"),
            F.expr(
                "CAST(abs(cusum_c) * 1000000 div peak_abs AS BIGINT)"
            ).alias("peak_share_ppm"),
            (F.col("di") == F.col("peak_di")).cast("int").alias("is_peak"),
        )
    )


QUERIES["cusum_changepoint"] = cusum_changepoint
ORACLE["cusum_changepoint"] = """
    WITH daily AS (
      SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS di,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1),
    piv AS (SELECT SUM(rev_c) // COUNT(*) AS cy FROM daily),
    cum AS (
      SELECT di, rev_c,
             SUM(rev_c - cy) OVER (ORDER BY di
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum_c
      FROM daily CROSS JOIN piv),
    peak AS (
      SELECT MIN(di) FILTER (WHERE ABS(cusum_c) = m) AS peak_di, ANY_VALUE(m) AS peak_abs
      FROM cum CROSS JOIN (SELECT MAX(ABS(cusum_c)) AS m FROM cum))
    SELECT c.di,
           CAST(c.rev_c AS BIGINT) AS rev_c,
           CAST(c.cusum_c AS BIGINT) AS cusum_c,
           CAST(ABS(c.cusum_c) * 1000000 // p.peak_abs AS BIGINT)
             AS peak_share_ppm,
           CAST(CASE WHEN c.di = p.peak_di THEN 1 ELSE 0 END AS INT) AS is_peak
    FROM cum c CROSS JOIN peak p
"""




def stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per Monday-aligned week — the product-
    engagement ratio ("what fraction of the week's actives show up on
    an average day"): sum of daily distinct users over the week's
    active days, divided by (active days x weekly distinct users),
    exact ppm with no pre-truncated intermediate average. The week key
    is pure integer arithmetic (days since Monday 1970-01-05 div 7),
    identical in both engines — no locale-sensitive week-of-year
    formatting.

    Shape: one events scan -> groupBy (week, day) with a distinct-user
    aggregate (two-phase, keys bounded by the calendar), a second
    distinct aggregate per week for WAU, joined on the tiny week grid.
    At 100 TB the only data-sized stages are the two distinct
    aggregates, both map-side partial."""
    events = load_table(spark, sf_dir, "events")
    keyed = events.select(
        F.expr("datediff(to_date(ts), date'1970-01-05') div 7").alias("wk"),
        F.to_date("ts").alias("d"),
        "user_id",
    )
    daily = keyed.groupBy("wk", "d").agg(
        F.countDistinct("user_id").alias("dau")
    )
    per_week = daily.groupBy("wk").agg(
        F.count("*").alias("n_days"), F.sum("dau").alias("sum_dau")
    )
    wau = keyed.groupBy("wk").agg(F.countDistinct("user_id").alias("wau"))
    return (
        per_week.join(wau, "wk")
        .select(
            F.col("wk").cast("long").alias("wk"),
            F.col("n_days").cast("long").alias("n_days"),
            F.col("sum_dau").cast("long").alias("sum_dau"),
            F.expr("sum_dau div n_days").alias("avg_dau"),
            F.col("wau").cast("long").alias("wau"),
            F.expr("sum_dau * 1000000 div (n_days * wau)").alias(
                "stickiness_ppm"
            ),
        )
    )


QUERIES["stickiness_dau_wau"] = stickiness_dau_wau
ORACLE["stickiness_dau_wau"] = """
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-05', CAST(ts AS DATE)) // 7
               AS wk,
             CAST(ts AS DATE) AS d,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2),
    per_week AS (
      SELECT wk, COUNT(*) AS n_days, SUM(dau) AS sum_dau
      FROM daily GROUP BY 1),
    wau AS (
      SELECT date_diff('day', DATE '1970-01-05', CAST(ts AS DATE)) // 7
               AS wk,
             COUNT(DISTINCT user_id) AS wau
      FROM events GROUP BY 1)
    SELECT CAST(p.wk AS BIGINT) AS wk,
           CAST(p.n_days AS BIGINT) AS n_days,
           CAST(p.sum_dau AS BIGINT) AS sum_dau,
           CAST(p.sum_dau // p.n_days AS BIGINT) AS avg_dau,
           CAST(w.wau AS BIGINT) AS wau,
           CAST(p.sum_dau * 1000000 // (p.n_days * w.wau) AS BIGINT)
             AS stickiness_ppm
    FROM per_week p JOIN wau w USING (wk)
"""


def runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue (above/below the
    integer pivot mean): observed runs vs the expected
    1 + 2*n1*n2/n, as an exact cross-multiplied ratio — too FEW runs
    means positive serial dependence (streaks), too many means
    oscillation. Complements the ACF (linear dependence) with an
    ordering-based randomness check; on this corpus the ratio hugs
    1e6, the i.i.d. verdict again. One output row.

    Shape: one data-sized pass to the ~2.4k-day grid; the
    run-boundary lag runs over that date-bounded grid (plan-lint
    whitelisted), and the expected-runs arithmetic is a 1-row
    aggregate: runs_ratio_ppm = obs_runs * n * 1e6 div (n + 2*n1*n2)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01"))
        .cast("long")
        .alias("di")
    ).agg(F.sum(_cents("o_totalprice")).alias("rev_c"))
    piv = daily.agg(F.expr("sum(rev_c) div count(*)").alias("cy"))
    signed = daily.crossJoin(F.broadcast(piv)).select(
        "di", (F.col("rev_c") > F.col("cy")).cast("int").alias("s")
    )
    w = Window.orderBy("di")
    runs = signed.withColumn("prev_s", F.lag("s").over(w)).agg(
        F.count("*").alias("n"),
        F.sum("s").alias("n1"),
        F.sum(
            (F.col("prev_s").isNull() | (F.col("s") != F.col("prev_s"))).cast(
                "long"
            )
        ).alias("obs_runs"),
    )
    return runs.select(
        F.col("n").cast("long").alias("n"),
        F.col("n1").cast("long").alias("n1"),
        (F.col("n") - F.col("n1")).cast("long").alias("n2"),
        F.col("obs_runs").cast("long").alias("obs_runs"),
        F.expr("(n + 2 * n1 * (n - n1)) * 1000 div n").alias("exp_runs_milli"),
        F.expr(
            "obs_runs * n * 1000000 div (n + 2 * n1 * (n - n1))"
        ).alias("runs_ratio_ppm"),
    )


QUERIES["runs_test_daily"] = runs_test_daily
ORACLE["runs_test_daily"] = """
    WITH daily AS (
      SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS di,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1),
    piv AS (SELECT SUM(rev_c) // COUNT(*) AS cy FROM daily),
    signed AS (
      SELECT di, CASE WHEN rev_c > cy THEN 1 ELSE 0 END AS s
      FROM daily CROSS JOIN piv),
    lagged AS (
      SELECT s, LAG(s) OVER (ORDER BY di) AS prev_s FROM signed),
    agg AS (
      SELECT COUNT(*) AS n, SUM(s) AS n1,
             SUM(CASE WHEN prev_s IS NULL OR s <> prev_s THEN 1 ELSE 0 END)
               AS obs_runs
      FROM lagged)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n1 AS BIGINT) AS n1,
           CAST(n - n1 AS BIGINT) AS n2,
           CAST(obs_runs AS BIGINT) AS obs_runs,
           CAST((n + 2 * n1 * (n - n1)) * 1000 // n AS BIGINT)
             AS exp_runs_milli,
           CAST(obs_runs * n * 1000000 // (n + 2 * n1 * (n - n1)) AS BIGINT)
             AS runs_ratio_ppm
    FROM agg
"""




def t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al.) — the third rung of the privacy
    ladder after k_anonymity_report and l_diversity_report, on the
    SAME QID (nation x balance band) and sensitive attribute (market
    segment): a class can be large AND diverse yet still leak if its
    sensitive distribution diverges from the corpus-wide one. Per QID
    class: the exact variational distance t = 1/2 * sum_j |p_j - q_j|
    as cross-multiplied ppm (t_ppm = sum_j |c_j*N - g_j*n_c| * 1e6
    div (2*n_c*N) — no per-class float division), plus the flag
    against the conventional t=0.2 release threshold.

    Shape: ONE scan -> groupBy (QID, segment) bounded by QID domain x
    |segments|; the global segment distribution is a 5-row broadcast;
    the per-class sum runs on the class x segment grid (a left join
    against the dense grid supplies the zero cells so missing
    segments still pay |0 - q_j|)."""
    cust = load_table(spark, sf_dir, "customer")
    bal_b = F.expr(
        f"CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) div {L_DIV_QID_BUCKET_C}"
    )
    cells = cust.groupBy(
        F.col("c_nationkey").alias("nat"),
        bal_b.alias("bal_b"),
        F.col("c_mktsegment").alias("seg"),
    ).agg(F.count("*").alias("c"))
    gseg = cells.groupBy("seg").agg(F.sum("c").alias("g"))
    n_all = cells.agg(F.sum("c").alias("n_tot"))
    classes = cells.groupBy("nat", "bal_b").agg(F.sum("c").alias("gsz"))
    grid = classes.crossJoin(F.broadcast(gseg.select("seg")))
    dense = grid.join(cells, ["nat", "bal_b", "seg"], "left").select(
        "nat", "bal_b", "seg", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    return (
        dense.join(F.broadcast(gseg), "seg")
        .join(classes, ["nat", "bal_b"])
        .crossJoin(F.broadcast(n_all))
        .groupBy("nat", "bal_b", "gsz", "n_tot")
        .agg(
            F.sum(
                F.abs(F.col("c") * F.col("n_tot") - F.col("g") * F.col("gsz"))
            ).alias("t_num")
        )
        .select(
            F.col("nat").cast("int").alias("nat"),
            F.col("bal_b").cast("long").alias("bal_b"),
            F.col("gsz").cast("long").alias("gsz"),
            F.expr(
                "CAST(CAST(t_num AS DECIMAL(38,0)) * 1000000"
                " div (2 * CAST(gsz AS DECIMAL(38,0)) * n_tot) AS BIGINT)"
            ).alias("t_ppm"),
            F.expr(
                "CAST(CASE WHEN CAST(t_num AS DECIMAL(38,0)) * 1000000"
                " div (2 * CAST(gsz AS DECIMAL(38,0)) * n_tot) > 200000"
                " THEN 1 ELSE 0 END AS INT)"
            ).alias("exceeds_t02"),
        )
    )


QUERIES["t_closeness_report"] = t_closeness_report
ORACLE["t_closeness_report"] = f"""
    WITH cells AS (
      SELECT c_nationkey AS nat,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
               // {200000} AS bal_b,
             c_mktsegment AS seg, COUNT(*) AS c
      FROM customer GROUP BY 1, 2, 3),
    gseg AS (SELECT seg, SUM(c) AS g FROM cells GROUP BY 1),
    n_all AS (SELECT SUM(c) AS n_tot FROM cells),
    classes AS (SELECT nat, bal_b, SUM(c) AS gsz FROM cells GROUP BY 1, 2),
    grid AS (SELECT cl.nat, cl.bal_b, cl.gsz, gs.seg, gs.g
             FROM classes cl CROSS JOIN gseg gs),
    dense AS (
      SELECT gr.nat, gr.bal_b, gr.gsz, gr.g, COALESCE(ce.c, 0) AS c
      FROM grid gr LEFT JOIN cells ce
        ON ce.nat = gr.nat AND ce.bal_b = gr.bal_b AND ce.seg = gr.seg)
    SELECT CAST(d.nat AS INT) AS nat,
           CAST(d.bal_b AS BIGINT) AS bal_b,
           CAST(d.gsz AS BIGINT) AS gsz,
           CAST(CAST(SUM(ABS(d.c * a.n_tot - d.g * d.gsz)) AS HUGEINT)
                * 1000000 // (2 * CAST(d.gsz AS HUGEINT) * a.n_tot)
                AS BIGINT) AS t_ppm,
           CAST(CASE WHEN CAST(SUM(ABS(d.c * a.n_tot - d.g * d.gsz))
                               AS HUGEINT) * 1000000
                          // (2 * CAST(d.gsz AS HUGEINT) * a.n_tot) > 200000
                     THEN 1 ELSE 0 END AS INT) AS exceeds_t02
    FROM dense d CROSS JOIN n_all a
    GROUP BY d.nat, d.bal_b, d.gsz, a.n_tot
"""


def hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market concentration of revenue across
    customer nations: per nation its exact revenue share (ppm) and
    concentration rank, plus the corpus-wide HHI in the conventional
    0-10000 points (sum of squared percent shares) computed as ONE
    cross-multiplied division: hhi_e4 = sum(rev_i^2) * 10000 div
    (sum(rev))^2 — the antitrust/portfolio-concentration screen, dual
    of the Simpson diversity index. CR4 falls out of the cumulative
    share column (rank <= 4).

    Shape: orders joins customer on the custkey hash exchange (both
    sides data-sized at 100 TB — no broadcast), collapses to the
    ~25-row nation frame; ranking and squared-share sums run there
    (plan-lint whitelisted dimension window). rev^2 routes through
    DECIMAL(38): nation revenue is corpus-sized, its square is not
    int64."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nat"),
    )
    per_nat = (
        orders.select("o_custkey", _cents("o_totalprice").alias("rev_c"))
        .join(cust, "o_custkey")
        .groupBy("nat")
        .agg(F.sum("rev_c").alias("rev_c"))
    )
    tot = per_nat.agg(
        F.sum("rev_c").alias("sum_rev"),
        F.sum(
            F.col("rev_c").cast("decimal(38,0)") * F.col("rev_c")
        ).alias("sum_rev2"),
    )
    w = Window.orderBy(F.col("rev_c").desc(), "nat")
    wc = Window.orderBy(F.col("rev_c").desc(), "nat").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per_nat.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn("cum_rev", F.sum("rev_c").over(wc))
        .select(
            F.col("nat").cast("int").alias("nat"),
            "rank",
            F.col("rev_c").cast("long").alias("rev_c"),
            # same DECIMAL(38,0) route as cum_share_ppm: rev_c * 1e6
            # wraps BIGINT once one nation's revenue passes ~9.2e12
            # cents — the exact scale this key's docstring claims to
            # survive (round-7 ADVICE).
            F.expr(
                "CAST(CAST(rev_c AS DECIMAL(38,0)) * 1000000"
                " div CAST(sum_rev AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("share_ppm"),
            F.expr(
                "CAST(CAST(cum_rev AS DECIMAL(38,0)) * 1000000"
                " div CAST(sum_rev AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("cum_share_ppm"),
            F.expr(
                "CAST(sum_rev2 * 10000 div (CAST(sum_rev AS DECIMAL(38,0))"
                " * sum_rev) AS BIGINT)"
            ).alias("hhi_e4"),
        )
    )


QUERIES["hhi_by_nation"] = hhi_by_nation
ORACLE["hhi_by_nation"] = """
    WITH per_nat AS (
      SELECT c.c_nationkey AS nat,
             SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1),
    tot AS (
      SELECT SUM(rev_c) AS sum_rev,
             SUM(CAST(rev_c AS HUGEINT) * rev_c) AS sum_rev2
      FROM per_nat),
    ranked AS (
      SELECT nat, rev_c,
             ROW_NUMBER() OVER (ORDER BY rev_c DESC, nat) AS rank,
             SUM(rev_c) OVER (ORDER BY rev_c DESC, nat
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
      FROM per_nat)
    SELECT CAST(r.nat AS INT) AS nat,
           CAST(r.rank AS INT) AS rank,
           CAST(r.rev_c AS BIGINT) AS rev_c,
           CAST(r.rev_c * 1000000 // t.sum_rev AS BIGINT) AS share_ppm,
           CAST(CAST(r.cum_rev AS HUGEINT) * 1000000 // t.sum_rev AS BIGINT)
             AS cum_share_ppm,
           CAST(t.sum_rev2 * 10000 // (CAST(t.sum_rev AS HUGEINT) * t.sum_rev)
                AS BIGINT) AS hhi_e4
    FROM ranked r CROSS JOIN tot t
"""


# ---------------------------------------------------------------------------
# Privacy repair (round 8): the remediation step on top of the k/l/t
# audit ladder — audits say WHICH classes leak; this says what the
# released table looks like after bottom-up local generalization.
# ---------------------------------------------------------------------------

#: Target class size for k_anonymity_repair. K=10 exercises the full
#: ladder at the driver's correctness SF (sf0.01: 88 classes pass at
#: level 0, 7 repair at level 1, 3 at nation-only, 14 suppress —
#: verified in DuckDB before wiring, per the liveness rule).
K_REPAIR = 10


def k_anonymity_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity REPAIR over the l/t-ladder QID (nation x $2000
    account-balance band): bottom-up local recoding with a fixed
    generalization ladder — level 0 keeps the $2000 band, level 1
    widens failing classes to $8000 bands, level 2 drops the band
    (nation only), level 3 suppresses what still can't reach K — and
    reports, per ORIGINAL level-0 class, the level its rows are
    released at and the size of the anonymized class they land in.
    Local recoding (only FAILING classes promote; satisfied classes
    keep their granularity) is what production anonymizers do —
    full-domain recoding would widen every band because one sparse
    nation leaks.

    Shape: one customer scan collapses to the level-0 QID-class frame
    (bounded by |nations| x balance-band domain, never rows); every
    later stage — the two promotion regroups and the three left joins
    stitching the verdicts back — runs on that tiny frame with
    broadcast joins. At 100 TB the scan is the only data-sized stage,
    exactly like the audits this repairs."""
    cust = load_table(spark, sf_dir, "customer")
    b0 = F.expr(
        f"CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) div {L_DIV_QID_BUCKET_C}"
    )
    l0 = cust.groupBy(
        F.col("c_nationkey").alias("nat"), b0.alias("bal_b")
    ).agg(F.count("*").alias("n"))
    f0 = l0.filter(F.col("n") < K_REPAIR)
    l1 = f0.groupBy(
        "nat", F.expr("bal_b div 4").alias("b1")
    ).agg(F.sum("n").alias("n1"))
    f1 = l1.filter(F.col("n1") < K_REPAIR)
    l2 = f1.groupBy("nat").agg(F.sum("n1").alias("n2"))
    return (
        l0.withColumn("b1", F.expr("bal_b div 4"))
        .join(F.broadcast(l1), ["nat", "b1"], "left")
        .join(F.broadcast(l2), ["nat"], "left")
        .select(
            F.col("nat").cast("int").alias("nat"),
            F.col("bal_b").cast("long").alias("bal_b"),
            F.col("n").cast("long").alias("n_rows"),
            F.expr(
                f"CAST(CASE WHEN n >= {K_REPAIR} THEN 0"
                f" WHEN n1 >= {K_REPAIR} THEN 1"
                f" WHEN n2 >= {K_REPAIR} THEN 2"
                " ELSE 3 END AS INT)"
            ).alias("final_level"),
            F.expr(
                f"CAST(CASE WHEN n >= {K_REPAIR} THEN n"
                f" WHEN n1 >= {K_REPAIR} THEN n1"
                f" WHEN n2 >= {K_REPAIR} THEN n2"
                " ELSE 0 END AS BIGINT)"
            ).alias("anon_k"),
        )
    )


QUERIES["k_anonymity_repair"] = k_anonymity_repair
ORACLE["k_anonymity_repair"] = f"""
    WITH c AS (
      SELECT c_nationkey AS nat,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
               // {L_DIV_QID_BUCKET_C} AS bal_b
      FROM customer),
    l0 AS (SELECT nat, bal_b, COUNT(*) AS n FROM c GROUP BY 1, 2),
    f0 AS (SELECT * FROM l0 WHERE n < {K_REPAIR}),
    l1 AS (SELECT nat, bal_b // 4 AS b1, SUM(n) AS n1 FROM f0 GROUP BY 1, 2),
    f1 AS (SELECT * FROM l1 WHERE n1 < {K_REPAIR}),
    l2 AS (SELECT nat, SUM(n1) AS n2 FROM f1 GROUP BY 1)
    SELECT CAST(l0.nat AS INT) AS nat,
           CAST(l0.bal_b AS BIGINT) AS bal_b,
           CAST(l0.n AS BIGINT) AS n_rows,
           CAST(CASE WHEN l0.n >= {K_REPAIR} THEN 0
                     WHEN l1.n1 >= {K_REPAIR} THEN 1
                     WHEN l2.n2 >= {K_REPAIR} THEN 2
                     ELSE 3 END AS INT) AS final_level,
           CAST(CASE WHEN l0.n >= {K_REPAIR} THEN l0.n
                     WHEN l1.n1 >= {K_REPAIR} THEN l1.n1
                     WHEN l2.n2 >= {K_REPAIR} THEN l2.n2
                     ELSE 0 END AS BIGINT) AS anon_k
    FROM l0
    LEFT JOIN l1 ON l1.nat = l0.nat AND l1.b1 = l0.bal_b // 4
    LEFT JOIN l2 ON l2.nat = l0.nat
"""


# ---------------------------------------------------------------------------
# Robust (median/MAD) outlier screen (round 8)
# ---------------------------------------------------------------------------


def mad_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source document-length outlier screen: median and
    median-absolute-deviation of n_chars per source, and how many docs
    sit beyond the 3-MAD fence — the screen that, unlike
    outlier_zscore, a handful of monster documents cannot drag (mean
    and stddev both chase the outliers they're supposed to find;
    median/MAD don't). Medians are exact nearest-rank (lower median,
    rank (n+1) div 2) computed from value HISTOGRAMS — the
    shipping_lag_report technique — so no per-source sort of document
    rows ever happens and the arithmetic is all-integer.

    Shape: one scan collapses to the (source, n_chars) histogram
    (sources x distinct-length grid, value-domain-bounded); both
    median extractions are cumulative windows PARTITIONED by source
    over that grid; the deviation histogram is a regroup of the same
    grid. At 100 TB every post-scan frame is still grid-sized."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    hist = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    tot = hist.groupBy("source").agg(F.sum("cnt").alias("n"))
    wsrc = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    med = (
        hist.withColumn("cum", F.sum("cnt").over(wsrc))
        .join(F.broadcast(tot), "source")
        .filter(F.expr("cum >= (n + 1) div 2"))
        .groupBy("source")
        .agg(F.min("v").alias("med"))
    )
    devh = (
        hist.join(F.broadcast(med), "source")
        .groupBy("source", F.abs(F.col("v") - F.col("med")).alias("dev"))
        .agg(F.sum("cnt").alias("cnt"), F.first("med").alias("med"))
    )
    wdev = (
        Window.partitionBy("source")
        .orderBy("dev")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    mad = (
        devh.withColumn("cum", F.sum("cnt").over(wdev))
        .join(F.broadcast(tot), "source")
        .filter(F.expr("cum >= (n + 1) div 2"))
        .groupBy("source")
        .agg(F.min("dev").alias("mad"))
    )
    fenced = (
        devh.join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad"), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("n_out"),
        )
    )
    return fenced.join(F.broadcast(tot), "source").select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.col("med").cast("long").alias("med_chars"),
        F.col("mad").cast("long").alias("mad_chars"),
        F.col("n_out").cast("long").alias("n_outliers"),
        # DECIMAL(38,0) numerator: n_out * 1e6 wraps BIGINT once a
        # source holds ~9.2e12 outliers (round-9 advice fix — the
        # oracle sums in HUGEINT, so the engines would diverge first).
        F.expr(
            "CAST(CAST(n_out AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"
        ).alias("outlier_ppm"),
    )


QUERIES["mad_outlier_report"] = mad_outlier_report
ORACLE["mad_outlier_report"] = """
    WITH hist AS (
      SELECT source, n_chars AS v, COUNT(*) AS cnt
      FROM documents GROUP BY 1, 2),
    tot AS (SELECT source, SUM(cnt) AS n FROM hist GROUP BY 1),
    med AS (
      SELECT source, MIN(v) AS med FROM (
        SELECT h.source, h.v,
               SUM(h.cnt) OVER (PARTITION BY h.source ORDER BY h.v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               t.n
        FROM hist h JOIN tot t USING (source))
      WHERE cum >= (n + 1) // 2 GROUP BY 1),
    devh AS (
      SELECT h.source, ABS(h.v - m.med) AS dev, SUM(h.cnt) AS cnt,
             ANY_VALUE(m.med) AS med
      FROM hist h JOIN med m USING (source) GROUP BY 1, 2),
    mad AS (
      SELECT source, MIN(dev) AS mad FROM (
        SELECT d.source, d.dev,
               SUM(d.cnt) OVER (PARTITION BY d.source ORDER BY d.dev
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               t.n
        FROM devh d JOIN tot t USING (source))
      WHERE cum >= (n + 1) // 2 GROUP BY 1),
    fenced AS (
      SELECT d.source, ANY_VALUE(d.med) AS med, ANY_VALUE(a.mad) AS mad,
             SUM(CASE WHEN d.dev > 3 * a.mad THEN d.cnt ELSE 0 END) AS n_out
      FROM devh d JOIN mad a USING (source) GROUP BY 1)
    SELECT f.source,
           CAST(t.n AS BIGINT) AS n_docs,
           CAST(f.med AS BIGINT) AS med_chars,
           CAST(f.mad AS BIGINT) AS mad_chars,
           CAST(f.n_out AS BIGINT) AS n_outliers,
           CAST(f.n_out * 1000000 // t.n AS BIGINT) AS outlier_ppm
    FROM fenced f JOIN tot t USING (source)
"""


def anonymized_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RELEASED table k_anonymity_repair plans: one row per
    customer carrying exactly the quasi-identifier granularity its
    class was generalized to — level 0 keeps the $2000 band id,
    level 1 the $8000 band id, level 2 nation only (band withheld),
    suppressed rows carry neither QID — so every released (qid_nat,
    qid_band) combination has ≥ K_REPAIR members by construction
    (audit → repair plan → release artifact: the full ladder).
    Band ids with an explicit width column (not bounds) keep negative
    balances exact under truncating div.

    Shape: the repair plan is a QID-domain-bounded frame, broadcast
    onto the customer scan — one data-sized stage, no window, no sort.
    The release is recomputable and idempotent: same corpus, same
    table."""
    cust = load_table(spark, sf_dir, "customer")
    b0 = F.expr(
        f"CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) div {L_DIV_QID_BUCKET_C}"
    )
    plan = k_anonymity_repair(spark, sf_dir).select(
        "nat", "bal_b", "final_level"
    )
    return (
        cust.select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_nationkey").alias("nat"),
            b0.alias("bal_b"),
        )
        .join(F.broadcast(plan), ["nat", "bal_b"])
        .select(
            "custkey",
            F.col("final_level").alias("released_level"),
            F.expr("CASE WHEN final_level <= 2 THEN CAST(nat AS INT) END").alias(
                "qid_nat"
            ),
            F.expr(
                "CAST(CASE WHEN final_level = 0 THEN bal_b"
                " WHEN final_level = 1 THEN bal_b div 4 END AS BIGINT)"
            ).alias("qid_band"),
            F.expr(
                f"CAST(CASE WHEN final_level = 0 THEN {L_DIV_QID_BUCKET_C}"
                f" WHEN final_level = 1 THEN {L_DIV_QID_BUCKET_C * 4} END"
                " AS BIGINT)"
            ).alias("qid_band_w_c"),
            F.expr(
                "CAST(CASE WHEN final_level = 3 THEN 1 ELSE 0 END AS INT)"
            ).alias("suppressed"),
        )
    )


QUERIES["anonymized_release"] = anonymized_release
ORACLE["anonymized_release"] = f"""
    WITH c AS (
      SELECT c_custkey AS custkey, c_nationkey AS nat,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
               // {L_DIV_QID_BUCKET_C} AS bal_b
      FROM customer),
    l0 AS (SELECT nat, bal_b, COUNT(*) AS n FROM c GROUP BY 1, 2),
    f0 AS (SELECT * FROM l0 WHERE n < {K_REPAIR}),
    l1 AS (SELECT nat, bal_b // 4 AS b1, SUM(n) AS n1 FROM f0 GROUP BY 1, 2),
    f1 AS (SELECT * FROM l1 WHERE n1 < {K_REPAIR}),
    l2 AS (SELECT nat, SUM(n1) AS n2 FROM f1 GROUP BY 1),
    plan AS (
      SELECT l0.nat, l0.bal_b,
             CASE WHEN l0.n >= {K_REPAIR} THEN 0
                  WHEN l1.n1 >= {K_REPAIR} THEN 1
                  WHEN l2.n2 >= {K_REPAIR} THEN 2
                  ELSE 3 END AS final_level
      FROM l0
      LEFT JOIN l1 ON l1.nat = l0.nat AND l1.b1 = l0.bal_b // 4
      LEFT JOIN l2 ON l2.nat = l0.nat)
    SELECT c.custkey,
           CAST(p.final_level AS INT) AS released_level,
           CAST(CASE WHEN p.final_level <= 2 THEN c.nat END AS INT) AS qid_nat,
           CAST(CASE WHEN p.final_level = 0 THEN c.bal_b
                     WHEN p.final_level = 1 THEN c.bal_b // 4 END AS BIGINT)
             AS qid_band,
           CAST(CASE WHEN p.final_level = 0 THEN {L_DIV_QID_BUCKET_C}
                     WHEN p.final_level = 1 THEN {L_DIV_QID_BUCKET_C * 4} END
             AS BIGINT) AS qid_band_w_c,
           CAST(CASE WHEN p.final_level = 3 THEN 1 ELSE 0 END AS INT)
             AS suppressed
    FROM c JOIN plan p ON p.nat = c.nat AND p.bal_b = c.bal_b
"""


# ---------------------------------------------------------------------------
# Robust statistics, continued (round 8): Theil-Sen trend + winsorized
# mean — the robust twins of ols_trend_monthly and the plain mean, the
# way mad_outlier_report twins outlier_zscore.
# ---------------------------------------------------------------------------


def theil_sen_trend_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of monthly revenue: the median of all
    pairwise slopes (y_j - y_i)/(x_j - x_i) over the month grid, plus
    the median-intercept — up to ~29% of months can be arbitrarily
    corrupted (a refund storm, a backfill gap) without moving the
    estimate, where ols_trend_monthly's least squares chases every
    outlier. Slopes are carried as the deterministic truncated key
    dy*1e6 div dx (cents-per-month ppm-resolution; exact-fraction ties
    below 1e-6 collapse — immaterial and identical in both engines),
    the median is nearest-rank (lower) over the slope histogram, and
    the intercept is the median of rev_c - slope*mi over months.

    Shape: the orders scan collapses to the month grid (80 rows,
    thousands at most ever); the pair frame is months² — bounded by
    the CALENDAR, independent of data volume — built as a broadcast
    range self-join; both medians are cumulative windows over
    calendar-bounded histograms. dy*1e6 routes through DECIMAL(38,0)
    (monthly revenue cents ×1e6 passes BIGINT at 100 TB)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        (
            (F.year("o_orderdate") - F.lit(1995)) * 12
            + F.month("o_orderdate")
            - 1
        )
        .cast("long")
        .alias("mi")
    ).agg(F.sum(_cents("o_totalprice")).alias("rev_c"))
    a, b = monthly.alias("a"), monthly.alias("b")
    pairs = a.join(F.broadcast(b), F.col("b.mi") > F.col("a.mi")).select(
        F.expr(
            "CAST(CAST(b.rev_c - a.rev_c AS DECIMAL(38,0)) * 1000000"
            " div (b.mi - a.mi) AS BIGINT)"
        ).alias("slope_e6")
    )
    hist = pairs.groupBy("slope_e6").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("slope_e6").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = hist.agg(F.sum("cnt").alias("n_pairs"))
    slope = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .crossJoin(F.broadcast(tot))
        .filter(F.expr("cum >= (n_pairs + 1) div 2"))
        .agg(
            F.min("slope_e6").alias("ts_slope_e6"),
            F.first("n_pairs").alias("n_pairs"),
        )
    )
    resid = monthly.crossJoin(F.broadcast(slope)).select(
        F.expr(
            "rev_c - CAST(CAST(ts_slope_e6 AS DECIMAL(38,0)) * mi"
            " div 1000000 AS BIGINT)"
        ).alias("ic")
    )
    whist = resid.groupBy("ic").agg(F.count("*").alias("cnt"))
    wcum2 = Window.orderBy("ic").rowsBetween(Window.unboundedPreceding, 0)
    mtot = whist.agg(F.sum("cnt").alias("n_months"))
    intercept = (
        whist.withColumn("cum", F.sum("cnt").over(wcum2))
        .crossJoin(F.broadcast(mtot))
        .filter(F.expr("cum >= (n_months + 1) div 2"))
        .agg(
            F.min("ic").alias("ts_intercept_c"),
            F.first("n_months").alias("n_months"),
        )
    )
    return slope.crossJoin(F.broadcast(intercept)).select(
        F.col("n_months").cast("long").alias("n_months"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("ts_slope_e6").cast("long").alias("ts_slope_e6"),
        F.col("ts_intercept_c").cast("long").alias("ts_intercept_c"),
    )


QUERIES["theil_sen_trend_monthly"] = theil_sen_trend_monthly
ORACLE["theil_sen_trend_monthly"] = """
    WITH monthly AS (
      SELECT (EXTRACT(year FROM o_orderdate) - 1995) * 12
               + EXTRACT(month FROM o_orderdate) - 1 AS mi,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1),
    pairs AS (
      SELECT CAST(CAST(b.rev_c - a.rev_c AS HUGEINT) * 1000000
                  // (b.mi - a.mi) AS BIGINT) AS slope_e6
      FROM monthly a JOIN monthly b ON b.mi > a.mi),
    hist AS (SELECT slope_e6, COUNT(*) AS cnt FROM pairs GROUP BY 1),
    tot AS (SELECT SUM(cnt) AS n_pairs FROM hist),
    slope AS (
      SELECT MIN(slope_e6) AS ts_slope_e6, ANY_VALUE(n_pairs) AS n_pairs
      FROM (SELECT slope_e6,
                   SUM(cnt) OVER (ORDER BY slope_e6
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM hist) CROSS JOIN tot
      WHERE cum >= (n_pairs + 1) // 2),
    resid AS (
      SELECT rev_c - CAST(CAST(ts_slope_e6 AS HUGEINT) * mi
                          // 1000000 AS BIGINT) AS ic
      FROM monthly CROSS JOIN slope),
    whist AS (SELECT ic, COUNT(*) AS cnt FROM resid GROUP BY 1),
    mtot AS (SELECT SUM(cnt) AS n_months FROM whist),
    icept AS (
      SELECT MIN(ic) AS ts_intercept_c, ANY_VALUE(n_months) AS n_months
      FROM (SELECT ic,
                   SUM(cnt) OVER (ORDER BY ic
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM whist) CROSS JOIN mtot
      WHERE cum >= (n_months + 1) // 2)
    SELECT CAST(i.n_months AS BIGINT) AS n_months,
           CAST(s.n_pairs AS BIGINT) AS n_pairs,
           CAST(s.ts_slope_e6 AS BIGINT) AS ts_slope_e6,
           CAST(i.ts_intercept_c AS BIGINT) AS ts_intercept_c
    FROM slope s CROSS JOIN icept i
"""


def winsorized_mean_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of document length per source: values clamped at
    the exact nearest-rank P5/P95 (ranks ceil(0.05n)/ceil(0.95n) from
    the value histogram) before averaging — the robust location
    estimate that keeps the mean's units and efficiency while capping
    any single monster document's pull at the fence value. Reported in
    centichars (mean_e2 = sum*100 div n) next to the raw mean so the
    gap itself is the tail-weight signal.

    Shape: identical to mad_outlier_report — one scan to the
    (source, n_chars) histogram, fences from source-partitioned
    cumulative windows over that value grid, the clamped mean a second
    pass over the HISTOGRAM (cnt-weighted), never over document rows."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    hist = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    tot = hist.groupBy("source").agg(F.sum("cnt").alias("n"))
    wsrc = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(wsrc)).join(
        F.broadcast(tot), "source"
    )
    lo = (
        cum.filter(F.expr("cum >= (5 * n + 99) div 100"))
        .groupBy("source")
        .agg(F.min("v").alias("lo_v"))
    )
    hi = (
        cum.filter(F.expr("cum >= (95 * n + 99) div 100"))
        .groupBy("source")
        .agg(F.min("v").alias("hi_v"))
    )
    return (
        hist.join(F.broadcast(lo), "source")
        .join(F.broadcast(hi), "source")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_docs"),
            F.first("lo_v").cast("long").alias("lo_chars"),
            F.first("hi_v").cast("long").alias("hi_chars"),
            F.sum(F.col("cnt") * F.col("v")).alias("_raw_sum"),
            F.sum(
                F.col("cnt")
                * F.greatest(F.least(F.col("v"), F.col("hi_v")), F.col("lo_v"))
            ).alias("_win_sum"),
        )
        .select(
            "source",
            "n_docs",
            "lo_chars",
            "hi_chars",
            F.expr("_raw_sum * 100 div n_docs").alias("raw_mean_e2"),
            F.expr("_win_sum * 100 div n_docs").alias("wins_mean_e2"),
        )
    )


QUERIES["winsorized_mean_by_source"] = winsorized_mean_by_source
ORACLE["winsorized_mean_by_source"] = """
    WITH hist AS (
      SELECT source, n_chars AS v, COUNT(*) AS cnt
      FROM documents GROUP BY 1, 2),
    tot AS (SELECT source, SUM(cnt) AS n FROM hist GROUP BY 1),
    cum AS (
      SELECT h.source, h.v, h.cnt, t.n,
             SUM(h.cnt) OVER (PARTITION BY h.source ORDER BY h.v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM hist h JOIN tot t USING (source)),
    lo AS (SELECT source, MIN(v) AS lo_v FROM cum
           WHERE cum >= (5 * n + 99) // 100 GROUP BY 1),
    hi AS (SELECT source, MIN(v) AS hi_v FROM cum
           WHERE cum >= (95 * n + 99) // 100 GROUP BY 1)
    SELECT h.source,
           CAST(SUM(h.cnt) AS BIGINT) AS n_docs,
           CAST(ANY_VALUE(lo.lo_v) AS BIGINT) AS lo_chars,
           CAST(ANY_VALUE(hi.hi_v) AS BIGINT) AS hi_chars,
           CAST(SUM(h.cnt * h.v) * 100 // SUM(h.cnt) AS BIGINT)
             AS raw_mean_e2,
           CAST(SUM(h.cnt * GREATEST(LEAST(h.v, hi.hi_v), lo.lo_v)) * 100
                // SUM(h.cnt) AS BIGINT) AS wins_mean_e2
    FROM hist h JOIN lo USING (source) JOIN hi USING (source)
    GROUP BY 1
"""


def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict this month =
    same month last year) over monthly revenue: per month with a
    year-ago counterpart, the forecast, the signed error in cents and
    the absolute percentage error in exact ppm — the baseline every
    forecasting pipeline must beat before a fancier model earns its
    keep, and the shape (join the month grid to itself at lag 12) is
    the template for any lag-k backtest. Integer end-to-end: the APE
    numerator routes through DECIMAL(38,0) (|err|*1e6 on monthly
    revenue cents wraps BIGINT at 100 TB).

    Shape: one orders scan collapses to the month grid; the lag-12
    self-join and every later stage run on that calendar-bounded frame
    as broadcast joins — no window at all."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month_ym"),
        (
            (F.year("o_orderdate") - F.lit(1995)) * 12
            + F.month("o_orderdate")
            - 1
        )
        .cast("long")
        .alias("mi"),
    ).agg(F.sum(_cents("o_totalprice")).alias("rev_c"))
    prior = monthly.select(
        (F.col("mi") + 12).alias("mi"), F.col("rev_c").alias("fcst_c")
    )
    return (
        monthly.join(F.broadcast(prior), "mi")
        .select(
            "month_ym",
            "mi",
            F.col("rev_c").cast("long").alias("rev_c"),
            F.col("fcst_c").cast("long").alias("fcst_c"),
            (F.col("rev_c") - F.col("fcst_c")).cast("long").alias("err_c"),
            F.expr(
                "CAST(abs(CAST(rev_c - fcst_c AS DECIMAL(38,0))) * 1000000"
                " div CAST(rev_c AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("ape_ppm"),
        )
    )


QUERIES["seasonal_naive_backtest"] = seasonal_naive_backtest
ORACLE["seasonal_naive_backtest"] = """
    WITH monthly AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month_ym,
             (EXTRACT(year FROM o_orderdate) - 1995) * 12
               + EXTRACT(month FROM o_orderdate) - 1 AS mi,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1, 2)
    SELECT a.month_ym, CAST(a.mi AS BIGINT) AS mi,
           CAST(a.rev_c AS BIGINT) AS rev_c,
           CAST(b.rev_c AS BIGINT) AS fcst_c,
           CAST(a.rev_c - b.rev_c AS BIGINT) AS err_c,
           CAST(ABS(CAST(a.rev_c - b.rev_c AS HUGEINT)) * 1000000
                // a.rev_c AS BIGINT) AS ape_ppm
    FROM monthly a JOIN monthly b ON b.mi = a.mi - 12
"""


# ---------------------------------------------------------------------------
# Mergeable quantile sketch audit (round 9): the quantile member of
# the sketch-audit family — cms_heavy_hitters (counts),
# hll_distinct_report (distincts), and now deciles — each a mergeable
# summary whose estimate is audited against the exact answer in the
# same oracled key.
# ---------------------------------------------------------------------------

#: Sub-buckets per power-of-two octave for quantile_sketch_audit.
#: 16 linear sub-buckets bound the relative error of any estimate by
#: the widest bucket's width/lo = 1/16 = 62_500 ppm.
QSK_SUB = 16

#: Bits kept from the top of v to index a sub-bucket: log2(QSK_SUB)+1
#: (the leading 1 plus log2(QSK_SUB) linear bits). Derived, not
#: hardcoded, so changing QSK_SUB keeps the bucket geometry consistent
#: everywhere the pair is interpolated (Spark, oracle, streaming twin).
QSK_TOP = QSK_SUB.bit_length()
assert QSK_SUB & (QSK_SUB - 1) == 0, "QSK_SUB must be a power of two"


def qsk_bucket_col() -> F.Column:
    """Sketch bucket id for a positive BIGINT column `v`: log2 octave
    (length(bin(v))) x QSK_SUB linear sub-buckets from the top QSK_TOP
    bits, exact below QSK_SUB. Monotone (weakly) in v, deterministic,
    and order-independent — shared by the batch audit and the streaming
    register build so the two provably sketch identically."""
    return F.expr(
        f"CASE WHEN v < {QSK_SUB} THEN v"
        f" ELSE length(bin(v)) * {QSK_SUB}"
        f" + (shiftright(v, length(bin(v)) - {QSK_TOP}) - {QSK_SUB}) END"
    )


def qsk_hi_col() -> F.Column:
    """Upper bound of sketch bucket `bid` — the decile estimate
    representative (>= every member value, < (1+1/QSK_SUB)x the
    smallest member)."""
    return F.expr(
        f"CASE WHEN bid < {QSK_SUB} THEN bid"
        f" ELSE shiftleft({QSK_SUB} + bid % {QSK_SUB},"
        f" CAST(bid div {QSK_SUB} AS INT) - {QSK_TOP})"
        f" + shiftleft(CAST(1 AS BIGINT),"
        f" CAST(bid div {QSK_SUB} AS INT) - {QSK_TOP}) - 1 END"
    )


def qsk_decile_estimates(sk: DataFrame) -> DataFrame:
    """Decile estimates from a (bid, cnt) register frame — the read
    side shared by the batch audit and the streaming monitor's view.
    Nearest-rank targets over the register cumulative; the two-pass
    bucketed cumsum keeps the only unpartitioned window on the ≤64-row
    octave offset frame."""
    from flinkproj_spark.functions import bucketed_cumsum

    spark = sk.sparkSession
    rep = sk.withColumn("hi", qsk_hi_col())
    cum_sk = bucketed_cumsum(
        rep, F.expr(f"bid div {QSK_SUB}"), [F.col("bid").asc()], ["cnt"]
    ).select(
        "bid", "hi", "cnt",
        F.col("cum_cnt").alias("cum"),
        (F.col("cum_cnt") - F.col("cnt")).alias("cumb"),
    )
    tot = sk.agg(F.sum("cnt").alias("n"))
    grid = spark.range(1, 10).select(F.col("id").cast("int").alias("decile"))
    tgt = grid.crossJoin(F.broadcast(tot)).select(
        "decile", F.expr("(decile * n + 9) div 10").alias("r")
    )
    return cum_sk.join(
        F.broadcast(tgt),
        (F.col("cum") >= F.col("r")) & (F.col("cumb") < F.col("r")),
    ).select("decile", F.col("hi").alias("est_c"))


def quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch-style mergeable quantile sketch audited against exact
    deciles of order revenue (o_totalprice in cents): values land in
    log2-octave x 16-linear-sub-bucket bins — a DETERMINISTIC,
    order-independent register set (unlike GK/KLL, whose compactions
    depend on arrival order or randomness), so shards/streams merge by
    ADDING bucket counts and two engines agree bit-for-bit. Per decile
    d in 1..9: the exact nearest-rank value, the sketch estimate (the
    straddling bucket's upper bound — always >= exact, relative error
    < 1/QSK_SUB by construction), and err_ppm. The register count is
    bounded by the VALUE DOMAIN (octaves x 16 ~ 1k buckets for any
    corpus), which is what makes the sketch worth shipping at 100 TB:
    a distributed groupBy onto ~1k cells with map-side combine, no
    distinct shuffle, no sort of the data. Mergeability is pinned by
    tests/test_operators.py::test_quantile_sketch_is_mergeable.

    Shape: one scan -> ~1k-cell sketch aggregate; the exact side is
    the one count-of-values histogram (present only because this key
    IS the audit of sketch vs truth), cumulated with the two-pass
    bucketed cumsum (log2-magnitude buckets), so the only
    unpartitioned windows are the <=64-row octave/magnitude offset
    frames; the 9-row decile grid and 1-row total ride broadcasts."""
    from flinkproj_spark.functions import bucketed_cumsum

    orders = load_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v")
    )
    sk = vals.select(qsk_bucket_col().alias("bid")).groupBy("bid").agg(
        F.count("*").alias("cnt")
    )
    est = qsk_decile_estimates(sk)
    tot = vals.agg(F.count("*").alias("n"))
    grid = spark.range(1, 10).select(F.col("id").cast("int").alias("decile"))
    tgt = grid.crossJoin(F.broadcast(tot)).select(
        "decile", F.expr("(decile * n + 9) div 10").alias("r")
    )
    hist = vals.groupBy("v").agg(F.count("*").alias("hc"))
    cum_ex = bucketed_cumsum(
        hist, F.length(F.bin("v")), [F.col("v").asc()], ["hc"]
    )
    exact = (
        cum_ex.join(F.broadcast(tgt), F.col("cum_hc") >= F.col("r"))
        .groupBy("decile")
        .agg(F.min("v").alias("exact_c"))
    )
    return exact.join(est, "decile").select(
        "decile",
        F.col("exact_c").cast("long").alias("exact_c"),
        F.col("est_c").cast("long").alias("est_c"),
        F.expr(
            "CAST(CAST(est_c - exact_c AS DECIMAL(38,0)) * 1000000"
            " div exact_c AS BIGINT)"
        ).alias("err_ppm"),
    )


QUERIES["quantile_sketch_audit"] = quantile_sketch_audit
ORACLE["quantile_sketch_audit"] = f"""
    WITH vals AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
      FROM orders),
    sk AS (
      SELECT CASE WHEN v < {QSK_SUB} THEN v
                  ELSE length(bin(v)) * {QSK_SUB}
                       + ((v >> (length(bin(v)) - {QSK_TOP})) - {QSK_SUB}) END AS bid,
             COUNT(*) AS cnt
      FROM vals GROUP BY 1),
    rep AS (
      SELECT bid, cnt,
             CASE WHEN bid < {QSK_SUB} THEN bid
                  ELSE (({QSK_SUB} + bid % {QSK_SUB})
                        << (bid // {QSK_SUB} - {QSK_TOP}))
                       + (1::BIGINT << (bid // {QSK_SUB} - {QSK_TOP})) - 1 END AS hi
      FROM sk),
    cum AS (
      SELECT bid, hi, cnt,
             SUM(cnt) OVER (ORDER BY bid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM rep),
    tot AS (SELECT COUNT(*) AS n FROM vals),
    tgt AS (
      SELECT dec, (dec * n + 9) // 10 AS r
      FROM (SELECT unnest(range(1, 10)) AS dec) g CROSS JOIN tot),
    est AS (
      SELECT t.dec, c.hi AS est_c
      FROM tgt t JOIN cum c ON c.cum >= t.r AND c.cum - c.cnt < t.r),
    hist AS (
      SELECT v, SUM(COUNT(*)) OVER (ORDER BY v) AS cumv
      FROM vals GROUP BY v),
    exact AS (
      SELECT t.dec, MIN(h.v) AS exact_c
      FROM tgt t JOIN hist h ON h.cumv >= t.r GROUP BY 1)
    SELECT CAST(x.dec AS INT) AS decile,
           CAST(x.exact_c AS BIGINT) AS exact_c,
           CAST(e.est_c AS BIGINT) AS est_c,
           CAST(CAST(e.est_c - x.exact_c AS HUGEINT) * 1000000
                // x.exact_c AS BIGINT) AS err_ppm
    FROM exact x JOIN est e USING (dec)
"""


# ---------------------------------------------------------------------------
# Join-strategy advisor (round 9): the consumer of
# analyze_tables_report's statistics — per FK edge of the star schema,
# the physical join strategy a cost-based planner would pick.
# ---------------------------------------------------------------------------

#: Broadcast ceiling in build-side ROWS — the row-count proxy for the
#: session's 10 MB autoBroadcastJoinThreshold at the ~1 KB star-schema
#: row. An advisor on a real catalog would read bytes; the stats table
#: this composes over carries rows/NDV, so the proxy is documented
#: rather than hidden.
JSA_BROADCAST_MAX_ROWS = 10_000
#: Average probe-side fanout (rows per distinct key) at or above which
#: the edge gets a skew hint (salting / AQE skew-join).
JSA_SKEW_FANOUT = 16

#: The star schema's FK join graph: (fact_table, fact_key, dim_table,
#: dim_key) — every equi-join the TPC-H-ish queries in this repo run.
JSA_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def join_strategy_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-join advisor over the star schema's FK graph: for each
    edge, the statistics a CBO consults (probe rows, probe-key NDV,
    build rows, average fanout, referenced-dim coverage) and the
    verdicts — broadcast vs shuffle by build-side size, a skew hint
    when the average fanout says the probe key is hot (salting / AQE
    skew-join territory), and a bucket-both hint for the big-big edges
    where co-partitioned layouts amortize the shuffle across queries.
    This is the advisor that reads what analyze_tables_report writes:
    composing the two keys is exactly the ANALYZE -> plan loop a real
    warehouse runs, and the verdict thresholds are the ones this
    repo's own operators apply by hand (F.broadcast on dims, salting
    on skewed keys, bucketing for lineitem><orders).

    Shape: the stats frame is ~35 rows (tables x profiled columns) and
    the edge grid is a 7-row literal — every join here is a broadcast
    of dimension-free frames; the table scans happened once, inside
    analyze_tables_report's one-aggregate-per-table pass. Advice is
    integer arithmetic (div / ppm) end to end."""
    stats = analyze_tables_report(spark, sf_dir)
    edges = spark.createDataFrame(
        list(JSA_EDGES), "fact_table string, fact_key string,"
        " dim_table string, dim_key string"
    )
    fact = stats.select(
        F.col("table_name").alias("fact_table"),
        F.col("column_name").alias("fact_key"),
        F.col("n_rows").alias("fact_rows"),
        F.col("n_distinct").alias("fact_key_ndv"),
    )
    dim = stats.select(
        F.col("table_name").alias("dim_table"),
        F.col("column_name").alias("dim_key"),
        F.col("n_rows").alias("dim_rows"),
    )
    return (
        edges.join(F.broadcast(fact), ["fact_table", "fact_key"])
        .join(F.broadcast(dim), ["dim_table", "dim_key"])
        .select(
            "fact_table",
            "fact_key",
            "dim_table",
            "dim_key",
            F.col("fact_rows").cast("long").alias("fact_rows"),
            F.col("fact_key_ndv").cast("long").alias("fact_key_ndv"),
            F.col("dim_rows").cast("long").alias("dim_rows"),
            F.expr("fact_rows div fact_key_ndv").alias("avg_fanout"),
            F.expr(
                "CAST(CAST(fact_key_ndv AS DECIMAL(38,0)) * 1000000"
                " div dim_rows AS BIGINT)"
            ).alias("ref_cover_ppm"),
            F.expr(
                f"CASE WHEN dim_rows <= {JSA_BROADCAST_MAX_ROWS}"
                " THEN 'broadcast' ELSE 'shuffle' END"
            ).alias("strategy"),
            F.expr(
                f"CAST(CASE WHEN fact_rows div fact_key_ndv >="
                f" {JSA_SKEW_FANOUT} THEN 1 ELSE 0 END AS INT)"
            ).alias("skew_salt_hint"),
            F.expr(
                f"CAST(CASE WHEN dim_rows > {JSA_BROADCAST_MAX_ROWS}"
                f" AND fact_rows div fact_key_ndv < {JSA_SKEW_FANOUT}"
                " THEN 1 ELSE 0 END AS INT)"
            ).alias("bucket_both_hint"),
        )
    )


QUERIES["join_strategy_advisor"] = join_strategy_advisor
_JSA_VALUES = ", ".join(
    f"('{ft}', '{fk}', '{dt}', '{dk}')" for ft, fk, dt, dk in JSA_EDGES
)
ORACLE["join_strategy_advisor"] = f"""
    WITH stats AS ({ORACLE["analyze_tables_report"]}),
    edges(fact_table, fact_key, dim_table, dim_key) AS (
      VALUES {_JSA_VALUES})
    SELECT e.fact_table, e.fact_key, e.dim_table, e.dim_key,
           CAST(f.n_rows AS BIGINT) AS fact_rows,
           CAST(f.n_distinct AS BIGINT) AS fact_key_ndv,
           CAST(d.n_rows AS BIGINT) AS dim_rows,
           CAST(f.n_rows // f.n_distinct AS BIGINT) AS avg_fanout,
           CAST(CAST(f.n_distinct AS HUGEINT) * 1000000 // d.n_rows
                AS BIGINT) AS ref_cover_ppm,
           CASE WHEN d.n_rows <= {JSA_BROADCAST_MAX_ROWS}
                THEN 'broadcast' ELSE 'shuffle' END AS strategy,
           CAST(CASE WHEN f.n_rows // f.n_distinct >= {JSA_SKEW_FANOUT}
                THEN 1 ELSE 0 END AS INT) AS skew_salt_hint,
           CAST(CASE WHEN d.n_rows > {JSA_BROADCAST_MAX_ROWS}
                AND f.n_rows // f.n_distinct < {JSA_SKEW_FANOUT}
                THEN 1 ELSE 0 END AS INT) AS bucket_both_hint
    FROM edges e
    JOIN stats f ON f.table_name = e.fact_table
                AND f.column_name = e.fact_key
    JOIN stats d ON d.table_name = e.dim_table
                AND d.column_name = e.dim_key
"""


# ---------------------------------------------------------------------------
# Round 9: experiment/release governance trio — DP sensitivity audit,
# A/B sample-ratio-mismatch check, and split-conformal coverage.
# ---------------------------------------------------------------------------

#: Salt for the experiment bucket coin — deliberately DISTINCT from
#: every sampling/split salt (sampling._SALT, _SPLIT_SALT), so variant
#: assignment is independent of all other hash coins (the round-9
#: ADVICE lesson on salt reuse).
SRM_SALT = "exp0"

#: Salt for the conformal calibration/test coin — same independence rule.
CONF_SALT = "conf0"

#: Conformal target: the calibration q90 should cover ~90% of test.
CONF_PCT = 90


def dp_sensitivity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation L1-sensitivity audit for a differentially-private
    revenue release: each nation's exact revenue, its contributor
    count, the largest single-customer contribution, and that
    maximum's share (ppm) — the Δf that calibrates Laplace/Gaussian
    noise for a SUM release, and the "one whale dominates this cell"
    flag that says clamp contributions before adding noise. The audit
    UPSTREAM of the k/l/t privacy ladder: those grade the released
    table, this grades the aggregation's exposure to one individual.

    Not in the reference (no aggregation surface beyond windowed
    count+max, SURVEY.md §2.9); privacy-governance extension on the
    k_anonymity family.

    Shape: one map-side-combined groupBy(custkey) collapses orders to
    per-customer totals BEFORE the customer join (orders-sized
    exchange, then a key-sized join — both data-sized at 100 TB, no
    broadcast), then a ~25-row nation aggregate. The ppm routes
    through DECIMAL(38,0) (nation revenue × 1e6 wraps BIGINT at
    scale, the round-8 ADVICE class)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nat"),
    )
    per_cust = (
        orders.select("o_custkey", _cents("o_totalprice").alias("rev_c"))
        .groupBy("o_custkey")
        .agg(F.sum("rev_c").alias("rev_c"))
        .join(cust, "o_custkey")
    )
    return (
        per_cust.groupBy("nat")
        .agg(
            F.count("*").alias("n_contributors"),
            F.sum("rev_c").alias("rev_c"),
            F.max("rev_c").alias("max_contrib_c"),
        )
        .select(
            F.col("nat").cast("int").alias("nat"),
            "n_contributors",
            F.col("rev_c").cast("long").alias("rev_c"),
            F.col("max_contrib_c").cast("long").alias("max_contrib_c"),
            F.expr(
                "CAST(CAST(max_contrib_c AS DECIMAL(38,0)) * 1000000"
                " div CAST(rev_c AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("sens_ppm"),
        )
    )


QUERIES["dp_sensitivity_report"] = dp_sensitivity_report
ORACLE["dp_sensitivity_report"] = """
    WITH per_cust AS (
      SELECT o_custkey,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1),
    j AS (
      SELECT c.c_nationkey AS nat, p.rev_c
      FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey)
    SELECT CAST(nat AS INT) AS nat,
           COUNT(*) AS n_contributors,
           CAST(SUM(rev_c) AS BIGINT) AS rev_c,
           CAST(MAX(rev_c) AS BIGINT) AS max_contrib_c,
           CAST(CAST(MAX(rev_c) AS HUGEINT) * 1000000 // SUM(rev_c)
                AS BIGINT) AS sens_ppm
    FROM j GROUP BY nat
"""


def srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment health check: deterministic 50/50 hash
    assignment of users to control/treatment, per-variant user/event/
    purchase tallies with user-level conversion ppm, and the
    sample-ratio-mismatch chi-square — for a 2-cell 50/50 design chi²
    reduces EXACTLY to (a−b)²/(a+b), reported ×1e6 as the pure
    integer srm_chi2_e6 (≥ 3.84e6 ≈ p<0.05 means the assignment is
    broken and every downstream metric is untrustworthy). The gate an
    experimentation pipeline runs before reading any lift number.

    Not in the reference (SURVEY.md §2.9 — no analytics surface);
    experimentation-governance extension over the events table.

    Shape: ONE corpus shuffle (groupBy user_id folds events to
    per-user rows with the variant computed in-row from the md5
    coin), then a 2-row variant aggregate; the chi² cross-term rides
    a broadcast 1-row pivot of that same 2-row frame. ppm/chi²
    numerators route through DECIMAL(38,0)."""
    ev = load_table(spark, sf_dir, "events")
    variant = F.when(
        F.substring(
            F.md5(F.concat(F.col("user_id").cast("string"), F.lit(SRM_SALT))), 1, 1
        )
        < "8",
        F.lit("control"),
    ).otherwise(F.lit("treatment"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_ev"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purch"),
        )
        .select(variant.alias("variant"), "n_ev", "n_purch")
    )
    per_var = per_user.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("n_ev").alias("n_events"),
        F.sum("n_purch").alias("n_purchases"),
        F.sum((F.col("n_purch") > 0).cast("long")).alias("n_converted"),
    )
    tot = per_var.agg(
        F.sum("n_users").alias("tot_users"),
        F.coalesce(
            F.max(F.when(F.col("variant") == "control", F.col("n_users"))), F.lit(0)
        ).alias("a"),
        F.coalesce(
            F.max(F.when(F.col("variant") == "treatment", F.col("n_users"))), F.lit(0)
        ).alias("b"),
    )
    return per_var.crossJoin(F.broadcast(tot)).select(
        "variant",
        "n_users",
        "n_events",
        "n_purchases",
        "n_converted",
        F.expr(
            "CAST(CAST(n_converted AS DECIMAL(38,0)) * 1000000"
            " div n_users AS BIGINT)"
        ).alias("conv_ppm"),
        F.expr(
            "CAST(CAST(a - b AS DECIMAL(38,0)) * (a - b) * 1000000"
            " div tot_users AS BIGINT)"
        ).alias("srm_chi2_e6"),
    )


QUERIES["srm_check"] = srm_check
ORACLE["srm_check"] = f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR)
                                     || '{SRM_SALT}'), 1, 1) < '8'
                  THEN 'control' ELSE 'treatment' END AS variant,
             COUNT(*) AS n_ev,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS n_purch
      FROM events GROUP BY 1, 2),
    per_var AS (
      SELECT variant, COUNT(*) AS n_users, SUM(n_ev) AS n_events,
             SUM(n_purch) AS n_purchases,
             SUM(CASE WHEN n_purch > 0 THEN 1 ELSE 0 END) AS n_converted
      FROM per_user GROUP BY 1),
    tot AS (
      SELECT SUM(n_users) AS tot_users,
             COALESCE(MAX(CASE WHEN variant = 'control'
                               THEN n_users END), 0) AS a,
             COALESCE(MAX(CASE WHEN variant = 'treatment'
                               THEN n_users END), 0) AS b
      FROM per_var)
    SELECT variant,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_purchases AS BIGINT) AS n_purchases,
           CAST(n_converted AS BIGINT) AS n_converted,
           CAST(CAST(n_converted AS HUGEINT) * 1000000 // n_users
                AS BIGINT) AS conv_ppm,
           CAST(CAST(a - b AS HUGEINT) * (a - b) * 1000000 // tot_users
                AS BIGINT) AS srm_chi2_e6
    FROM per_var CROSS JOIN tot
"""


def conformal_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal coverage audit per event type: a deterministic
    hash coin splits events into calibration/test halves, the
    calibration side yields the exact nearest-rank q90 of the value
    (integer cents), and the test side measures how many of its
    values that threshold actually covers (ppm — should sit near
    900000; a type drifting away means the calibration quantile no
    longer transfers, the basic health check of any conformal
    prediction deployment).

    Not in the reference (SURVEY.md §2.9); ML-evaluation extension in
    the quantile family (nearest-rank machinery shared with
    shipping_lag_report / quantile_sketch_audit).

    Shape: the calibration side collapses to a (type, cents)
    HISTOGRAM — bounded by the value domain (~49k distinct cents),
    corpus-size-independent — and the per-type threshold comes from
    the histogram's running count (cum·100 ≥ p·N integer comparison,
    window partitioned per type over histogram rows, never event
    rows). Thresholds broadcast back onto the test scan; one
    map-side-combined groupBy(type) folds coverage. Two scans of
    events, zero corpus-sized sorts."""
    ev = load_table(spark, sf_dir, "events")
    is_cal = (
        F.substring(
            F.md5(F.concat(F.col("event_id").cast("string"), F.lit(CONF_SALT))), 1, 1
        )
        < "8"
    )
    base = ev.select(
        "event_type", _cents("value").alias("v_c"), is_cal.alias("is_cal")
    )
    cal_hist = (
        base.filter(F.col("is_cal"))
        .groupBy("event_type", "v_c")
        .agg(F.count("*").alias("n"))
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v_c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    thr = (
        cal_hist.select(
            "event_type",
            "v_c",
            F.sum("n").over(w_cum).alias("cum_n"),
            F.sum("n").over(w_tot).alias("n_cal"),
        )
        .groupBy("event_type")
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.min(
                F.when(
                    F.col("cum_n") * 100 >= F.lit(CONF_PCT) * F.col("n_cal"),
                    F.col("v_c"),
                )
            ).alias("q90_c"),
        )
    )
    test = base.filter(~F.col("is_cal")).select("event_type", "v_c")
    return (
        test.join(F.broadcast(thr), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.count("*").alias("n_test"),
            F.max("q90_c").alias("q90_c"),
            F.sum((F.col("v_c") <= F.col("q90_c")).cast("long")).alias("n_covered"),
        )
        .select(
            "event_type",
            "n_cal",
            "n_test",
            "q90_c",
            "n_covered",
            F.expr(
                "CAST(CAST(n_covered AS DECIMAL(38,0)) * 1000000"
                " div n_test AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


QUERIES["conformal_coverage_report"] = conformal_coverage_report
ORACLE["conformal_coverage_report"] = f"""
    WITH base AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c,
             substring(md5(CAST(event_id AS VARCHAR)
                           || '{CONF_SALT}'), 1, 1) < '8' AS is_cal
      FROM events),
    hist AS (
      SELECT event_type, v_c, COUNT(*) AS n
      FROM base WHERE is_cal GROUP BY 1, 2),
    cum AS (
      SELECT event_type, v_c,
             SUM(n) OVER (PARTITION BY event_type ORDER BY v_c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
             SUM(n) OVER (PARTITION BY event_type) AS n_cal
      FROM hist),
    thr AS (
      SELECT event_type, MAX(n_cal) AS n_cal,
             MIN(CASE WHEN cum_n * 100 >= {CONF_PCT} * n_cal
                      THEN v_c END) AS q90_c
      FROM cum GROUP BY 1)
    SELECT b.event_type,
           CAST(MAX(t.n_cal) AS BIGINT) AS n_cal,
           COUNT(*) AS n_test,
           CAST(MAX(t.q90_c) AS BIGINT) AS q90_c,
           CAST(SUM(CASE WHEN b.v_c <= t.q90_c THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
           CAST(CAST(SUM(CASE WHEN b.v_c <= t.q90_c THEN 1 ELSE 0 END)
                     AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT)
             AS coverage_ppm
    FROM base b JOIN thr t ON t.event_type = b.event_type
    WHERE NOT b.is_cal
    GROUP BY b.event_type
"""


#: Clamp-grid width for dp_clamped_release: per-customer revenue is
#: quantized to 2^20-cent ($10.5k) buckets before the nearest-rank
#: scan, so the cumulative window runs over a domain-bounded histogram
#: (per-customer revenue is order-history-bounded, not corpus-sized) —
#: the same value-grid class as gini_revenue_lorenz's 2^24 frame.
DP_CLAMP_GRID = 1 << 20

#: Clamp percentile: contributions above the grid-aligned p99 ceiling
#: are clipped.
DP_CLAMP_PCT = 99


def dp_clamped_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repair step on top of dp_sensitivity_report: per-customer
    revenue contributions are CLAMPED at the grid-aligned p99 ceiling
    (the smallest 2^20-cent bucket boundary covering 99% of
    customers), and the per-nation release is recomputed from the
    clamped values — with the clipped mass (ppm) and clipped-customer
    count that quantify what the clamp cost. Contribution clamping is
    THE standard precondition for a DP sum release: it caps Δf at the
    threshold instead of the worst whale, so the audit → clamp pair
    mirrors the k-anonymity audit → repair ladder.

    Not in the reference (SURVEY.md §2.9); privacy-governance
    extension completing the dp_sensitivity family.

    Exactness: the threshold is DETERMINISTIC — nearest-rank on the
    quantized revenue histogram, reported as threshold_c on every row
    — and all clipped/clamped arithmetic is BIGINT cents with the ppm
    through DECIMAL(38,0).

    Shape: one groupBy(custkey) collapse, a domain-bounded histogram
    (≤ max_rev/2^20 rows) whose cumulative window never sees customer
    rows, the 1-row threshold broadcast back, in-row clamping, then
    the customer join and ~25-row nation aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nat"),
    )
    per_cust = (
        orders.select("o_custkey", _cents("o_totalprice").alias("rev_c"))
        .groupBy("o_custkey")
        .agg(F.sum("rev_c").alias("rev_c"))
    )
    hist = per_cust.groupBy(
        F.expr(f"rev_c div {DP_CLAMP_GRID}").alias("b")
    ).agg(F.count("*").alias("n"))
    w_cum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    thr = (
        hist.select(
            "b",
            F.sum("n").over(w_cum).alias("cum_n"),
            F.sum("n").over(w_tot).alias("total"),
        )
        .agg(
            F.min(
                F.when(
                    F.col("cum_n") * 100 >= F.lit(DP_CLAMP_PCT) * F.col("total"),
                    (F.col("b") + 1) * DP_CLAMP_GRID,
                )
            ).alias("threshold_c")
        )
    )
    clamped = per_cust.crossJoin(F.broadcast(thr)).select(
        "o_custkey",
        "rev_c",
        "threshold_c",
        F.least(F.col("rev_c"), F.col("threshold_c")).alias("clamped_c"),
    )
    return (
        clamped.join(cust, "o_custkey")
        .groupBy("nat")
        .agg(
            F.max("threshold_c").alias("threshold_c"),
            F.sum("rev_c").alias("rev_c"),
            F.sum("clamped_c").alias("clamped_rev_c"),
            F.sum((F.col("rev_c") > F.col("threshold_c")).cast("long")).alias(
                "n_clipped"
            ),
        )
        .select(
            F.col("nat").cast("int").alias("nat"),
            "threshold_c",
            F.col("rev_c").cast("long").alias("rev_c"),
            F.col("clamped_rev_c").cast("long").alias("clamped_rev_c"),
            "n_clipped",
            F.expr(
                "CAST(CAST(rev_c - clamped_rev_c AS DECIMAL(38,0)) * 1000000"
                " div CAST(rev_c AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("clipped_ppm"),
        )
    )


QUERIES["dp_clamped_release"] = dp_clamped_release
ORACLE["dp_clamped_release"] = f"""
    WITH per_cust AS (
      SELECT o_custkey,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1),
    hist AS (
      SELECT rev_c // {DP_CLAMP_GRID} AS b, COUNT(*) AS n
      FROM per_cust GROUP BY 1),
    cum AS (
      SELECT b,
             SUM(n) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
             SUM(n) OVER () AS total
      FROM hist),
    thr AS (
      SELECT MIN(CASE WHEN cum_n * 100 >= {DP_CLAMP_PCT} * total
                      THEN (b + 1) * {DP_CLAMP_GRID} END) AS threshold_c
      FROM cum),
    clamped AS (
      SELECT p.o_custkey, p.rev_c, t.threshold_c,
             least(p.rev_c, t.threshold_c) AS clamped_c
      FROM per_cust p CROSS JOIN thr t)
    SELECT CAST(c.c_nationkey AS INT) AS nat,
           CAST(MAX(cl.threshold_c) AS BIGINT) AS threshold_c,
           CAST(SUM(cl.rev_c) AS BIGINT) AS rev_c,
           CAST(SUM(cl.clamped_c) AS BIGINT) AS clamped_rev_c,
           CAST(SUM(CASE WHEN cl.rev_c > cl.threshold_c
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           CAST(CAST(SUM(cl.rev_c) - SUM(cl.clamped_c) AS HUGEINT) * 1000000
                // SUM(cl.rev_c) AS BIGINT) AS clipped_ppm
    FROM clamped cl JOIN customer c ON c.c_custkey = cl.o_custkey
    GROUP BY c.c_nationkey
"""


def interevent_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-event burstiness: within each (user, event_type)
    stream the whole-second gaps between consecutive events, reduced
    to exact moments and the Fano factor (variance-to-mean ratio,
    ×1e6) — Fano ≈ mean (for exponential gaps, fano_e6 ≈ mean_gap_s ×
    1e6 / 2... strictly: var=mean² → fano=mean) says Poisson arrivals,
    far above says bursts (retry storms for `error`, bot loops for
    `click`), far below says a metronome (scheduled jobs pretending to
    be users). The traffic-shape screen upstream of anomaly_rolling_z.

    Not in the reference (SURVEY.md §2.9); temporal-statistics
    extension in the moment_stats family.

    Exactness: gaps are unix_micros diffs floored to whole seconds
    (micros-exact on both engines — the relational.py asof idiom);
    Fano = (n·Σg² − (Σg)²)/(n·Σg) cross-multiplied in DECIMAL(38,0)
    (Σg² is corpus × domain²-sized — wraps BIGINT long before the
    output does). The sum_gap2 OUTPUT is reduced mod 2⁶¹−1 (TD_MOD,
    the table_digest_report trick) before the BIGINT cast — identity
    below 2.3e18, and past it both engines agree on the residue
    instead of diverging (Spark NULL vs DuckDB cast error). The Fano
    denominator is nullif-guarded on both sides: a theoretical
    all-zero-gap type yields NULL, not an engine split.

    Shape: one window partitioned by (user_id, event_type) — a
    corpus-sized frame but partitioned on a key whose cardinality
    scales with the data, never single-task — then one
    map-side-combined 5-row groupBy(event_type)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.expr(
        "(unix_micros(ts) - unix_micros(lag_ts)) div 1000000"
    )
    gaps = (
        ev.select(
            "event_type", "ts", "event_id", F.lag("ts").over(w).alias("lag_ts")
        )
        .filter(F.col("lag_ts").isNotNull())
        .select("event_type", gap.alias("g"))
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("g").alias("sum_gap_s"),
            F.sum(F.col("g").cast("decimal(38,0)") * F.col("g")).alias("_ss"),
            F.min("g").alias("min_gap_s"),
            F.max("g").alias("max_gap_s"),
        )
        .select(
            "event_type",
            "n_gaps",
            F.col("sum_gap_s").cast("long").alias("sum_gap_s"),
            F.expr(f"CAST(_ss % {TD_MOD} AS BIGINT)").alias("sum_gap2"),
            "min_gap_s",
            "max_gap_s",
            F.expr("sum_gap_s div n_gaps").alias("mean_gap_s"),
            F.expr(
                "CAST((CAST(n_gaps AS DECIMAL(38,0)) * _ss"
                " - CAST(sum_gap_s AS DECIMAL(38,0)) * sum_gap_s) * 1000000"
                " div nullif(CAST(n_gaps AS DECIMAL(38,0)) * sum_gap_s, 0)"
                " AS BIGINT)"
            ).alias("fano_e6"),
        )
    )


QUERIES["interevent_gap_profile"] = interevent_gap_profile
ORACLE["interevent_gap_profile"] = f"""
    WITH g AS (
      SELECT event_type,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id)) // 1000000 AS g
      FROM events),
    gaps AS (SELECT event_type, g FROM g WHERE g IS NOT NULL)
    SELECT event_type,
           COUNT(*) AS n_gaps,
           CAST(SUM(g) AS BIGINT) AS sum_gap_s,
           CAST(SUM(CAST(g AS HUGEINT) * g) % {TD_MOD} AS BIGINT) AS sum_gap2,
           CAST(MIN(g) AS BIGINT) AS min_gap_s,
           CAST(MAX(g) AS BIGINT) AS max_gap_s,
           CAST(SUM(g) // COUNT(*) AS BIGINT) AS mean_gap_s,
           CAST((CAST(COUNT(*) AS HUGEINT) * SUM(CAST(g AS HUGEINT) * g)
                 - CAST(SUM(g) AS HUGEINT) * SUM(g)) * 1000000
                // NULLIF(CAST(COUNT(*) AS HUGEINT) * SUM(g), 0)
                AS BIGINT) AS fano_e6
    FROM gaps GROUP BY event_type
"""


#: zonemap_effectiveness parameters: probe workload size (smallest-k
#: distinct users — literal-k bounded) and the Morton dimension width
#: (8 bits per dim: uid & 255 interleaved with hour & 255, so the
#: curve partitions the live uid domain — the audit's point is the
#: CONTRAST between layouts, not a production curve; the production
#: 16-bit curve is zorder_layout/write_zorder_layout).
ZM_PROBES = 20
ZM_BITS = 8


def zm_zorder_rows(events: DataFrame) -> DataFrame:
    """(b, uid) zone-map update rows for the Morton layout — the
    bin id and probe dimension zonemap_effectiveness aggregates and
    streaming/monitor.py::stream_zonemap_monitor maintains live, as
    ONE shared expression so the nightly audit and the ingest-time
    monitor can never disagree on the binning."""
    from flinkproj_spark import functions as fx

    minute = (F.unix_timestamp("ts") / 60).cast("long")
    base = events.select(F.col("user_id").alias("uid"), minute.alias("minute"))
    zc = fx.morton2(F.col("uid"), F.expr("minute div 60"), ZM_BITS)
    return base.select(zc.alias("zc"), "uid").select(
        F.shiftright("zc", ZM_BITS).alias("b"), "uid"
    )


def zonemap_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping audit: for the SAME point-lookup workload (the
    ZM_PROBES smallest user ids), what fraction of file-level zone
    maps (min/max user_id per file bin) must be scanned under (a) the
    natural time-partitioned layout — one bin per day — versus (b) a
    Morton-curve layout interleaving user and hour bits. Each bin's
    (min_uid, max_uid) IS the parquet footer statistic a lake scan
    planner consults; `scan_ppm` is the fraction of bins the probe
    cannot prune. Probed live before wiring: at sf0.01 the time
    layout scans 985000 ppm (every day-file spans every user) while
    the z-order layout scans ~100000 ppm — the 10× skip that
    justifies write_zorder_layout, here measured instead of asserted.

    Not in the reference (SURVEY.md §2.9); lake-layout extension in
    the zorder_layout/compaction_plan family.

    Shape: two bounded bin frames (≤ calendar days and ≤ 2^ZM_BITS
    curve buckets) built by map-side-combined groupBys, a literal-k
    probe frame (TakeOrderedAndProject), and broadcast range joins of
    probes × bins — nothing corpus-sized moves after the scans."""
    events = load_table(spark, sf_dir, "events")
    minute = (F.unix_timestamp("ts") / 60).cast("long")
    base = events.select(F.col("user_id").alias("uid"), minute.alias("minute"))
    bins_t = base.groupBy(F.expr("minute div 1440").alias("b")).agg(
        F.min("uid").alias("mn"), F.max("uid").alias("mx")
    )
    bins_z = zm_zorder_rows(events).groupBy("b").agg(
        F.min("uid").alias("mn"), F.max("uid").alias("mx")
    )
    probes = base.select("uid").distinct().orderBy("uid").limit(ZM_PROBES)

    def _row(label: str, bins: DataFrame) -> DataFrame:
        nb = bins.agg(F.count("*").alias("n_bins"))
        npr = probes.agg(F.count("*").alias("n_probes"))
        sc = probes.join(
            F.broadcast(bins),
            (F.col("uid") >= F.col("mn")) & (F.col("uid") <= F.col("mx")),
        ).agg(F.count("*").alias("n_scanned"))
        return (
            sc.crossJoin(F.broadcast(nb))
            .crossJoin(F.broadcast(npr))
            .select(
                F.lit(label).alias("layout"),
                "n_bins",
                "n_probes",
                "n_scanned",
                F.expr(
                    "CAST(CAST(n_scanned AS DECIMAL(38,0)) * 1000000"
                    " div (n_bins * n_probes) AS BIGINT)"
                ).alias("scan_ppm"),
            )
        )

    return _row("time", bins_t).unionAll(_row("zorder", bins_z))


QUERIES["zonemap_effectiveness"] = zonemap_effectiveness
_ZM_INTERLEAVE_SQL = " | ".join(
    f"(((u >> {i}) & 1) << {2 * i}) | (((m >> {i}) & 1) << {2 * i + 1})"
    for i in range(ZM_BITS)
)
ORACLE["zonemap_effectiveness"] = f"""
    WITH sec AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
    base AS (SELECT user_id AS uid, s // 60 AS minute FROM sec),
    bins_t AS (
      SELECT minute // 1440 AS b, MIN(uid) AS mn, MAX(uid) AS mx
      FROM base GROUP BY 1),
    coded AS (
      SELECT ({_ZM_INTERLEAVE_SQL}) AS zc, uid
      FROM (SELECT uid & {(1 << ZM_BITS) - 1} AS u,
                   (minute // 60) & {(1 << ZM_BITS) - 1} AS m, uid
            FROM base)),
    bins_z AS (
      SELECT zc >> {ZM_BITS} AS b, MIN(uid) AS mn, MAX(uid) AS mx
      FROM coded GROUP BY 1),
    probes AS (
      SELECT DISTINCT uid FROM base ORDER BY uid LIMIT {ZM_PROBES}),
    t AS (
      SELECT 'time' AS layout,
             (SELECT COUNT(*) FROM bins_t) AS n_bins,
             (SELECT COUNT(*) FROM probes) AS n_probes,
             (SELECT COUNT(*) FROM probes p
              JOIN bins_t ON p.uid BETWEEN bins_t.mn AND bins_t.mx)
               AS n_scanned),
    z AS (
      SELECT 'zorder' AS layout,
             (SELECT COUNT(*) FROM bins_z) AS n_bins,
             (SELECT COUNT(*) FROM probes) AS n_probes,
             (SELECT COUNT(*) FROM probes p
              JOIN bins_z ON p.uid BETWEEN bins_z.mn AND bins_z.mx)
               AS n_scanned),
    u AS (SELECT * FROM t UNION ALL SELECT * FROM z)
    SELECT layout, n_bins, n_probes, CAST(n_scanned AS BIGINT) AS n_scanned,
           CAST(CAST(n_scanned AS HUGEINT) * 1000000
                // (n_bins * n_probes) AS BIGINT) AS scan_ppm
    FROM u
"""


#: activity_migration_matrix parameters: the year pair being compared
#: and the order-count tier edges (1 order = low, 2 = mid, 3+ = high —
#: probed live: all 15 matrix cells populated at sf0.01).
AM_YEAR_FROM = 1996
AM_YEAR_TO = 1997


def activity_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer activity migration: each customer's
    order-count tier in AM_YEAR_FROM (absent/low/mid/high) against
    their tier in AM_YEAR_TO — the churn/acquisition/upgrade matrix a
    retention team reads (absent→x rows are acquisition, x→absent are
    churn, the diagonal is retention). Live in every cell on this
    corpus because ORDERS span 1995–2001 (the events table's 30-day
    span is why the weekly-churn report was dropped in round 8 — this
    is that report rebuilt on the table whose history supports it).

    Not in the reference (SURVEY.md §2.9); product-analytics extension
    in the retention_cohorts/rfm family.

    Shape: ONE scan with the two year filters as conditional
    aggregates of a single groupBy(custkey) — no self-join, no pivot
    — then tier classification in-row and a ≤16-row matrix rollup
    with the share over a broadcast 1-row total."""
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date"))
    per_cust = (
        orders.select("o_custkey", yr.alias("yr"))
        .filter(F.col("yr").isin(AM_YEAR_FROM, AM_YEAR_TO))
        .groupBy("o_custkey")
        .agg(
            F.sum((F.col("yr") == AM_YEAR_FROM).cast("long")).alias("n_from"),
            F.sum((F.col("yr") == AM_YEAR_TO).cast("long")).alias("n_to"),
        )
    )

    def tier(n):
        return (
            F.when(n == 0, "absent")
            .when(n <= 1, "low")
            .when(n <= 2, "mid")
            .otherwise("high")
        )

    mat = per_cust.select(
        tier(F.col("n_from")).alias("tier_from"),
        tier(F.col("n_to")).alias("tier_to"),
    ).groupBy("tier_from", "tier_to").agg(F.count("*").alias("n_customers"))
    tot = mat.agg(F.sum("n_customers").alias("total"))
    return mat.crossJoin(F.broadcast(tot)).select(
        "tier_from",
        "tier_to",
        "n_customers",
        F.expr(
            "CAST(CAST(n_customers AS DECIMAL(38,0)) * 1000000"
            " div total AS BIGINT)"
        ).alias("share_ppm"),
    )


QUERIES["activity_migration_matrix"] = activity_migration_matrix
ORACLE["activity_migration_matrix"] = f"""
    WITH per_cust AS (
      SELECT o_custkey,
             SUM(CASE WHEN EXTRACT(year FROM CAST(o_orderdate AS DATE))
                      = {AM_YEAR_FROM} THEN 1 ELSE 0 END) AS n_from,
             SUM(CASE WHEN EXTRACT(year FROM CAST(o_orderdate AS DATE))
                      = {AM_YEAR_TO} THEN 1 ELSE 0 END) AS n_to
      FROM orders
      WHERE EXTRACT(year FROM CAST(o_orderdate AS DATE))
            IN ({AM_YEAR_FROM}, {AM_YEAR_TO})
      GROUP BY 1),
    mat AS (
      SELECT CASE WHEN n_from = 0 THEN 'absent' WHEN n_from <= 1 THEN 'low'
                  WHEN n_from <= 2 THEN 'mid' ELSE 'high' END AS tier_from,
             CASE WHEN n_to = 0 THEN 'absent' WHEN n_to <= 1 THEN 'low'
                  WHEN n_to <= 2 THEN 'mid' ELSE 'high' END AS tier_to,
             COUNT(*) AS n_customers
      FROM per_cust GROUP BY 1, 2),
    tot AS (SELECT SUM(n_customers) AS total FROM mat)
    SELECT tier_from, tier_to, CAST(n_customers AS BIGINT) AS n_customers,
           CAST(CAST(n_customers AS HUGEINT) * 1000000 // total AS BIGINT)
             AS share_ppm
    FROM mat CROSS JOIN tot
"""

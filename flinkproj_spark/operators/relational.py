"""Relational/analytic query family.

The reference has no SQL layer (SURVEY.md §2.9) — Spark provides all of
this natively, and these queries declare that surface so the oracle
exercises it: TPC-H-style multi-join aggregations, window (analytic)
functions, sessionization, set ops, rollup, pivot, and an as-of join
(which Spark lacks natively; implemented as the union+window trick).

Scale notes baked into each plan:
  * monetary aggregates are summed as DECIMAL — exact, order-independent,
    so parallel partial aggregation at any partition count is
    bit-reproducible (double sums are not);
  * joins keep dimension sides broadcast-able and put the filter BEFORE
    the join so Catalyst pushes it into the parquet scan;
  * top-k uses rank-within-partition, never a global sort of the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkproj_spark.sources.tables import load_table


def _cents(col):
    """Exact money math: the corpus monetary columns carry exactly two
    decimals, so floor(x*100+0.5) recovers the integer cents losslessly.
    All revenue formulas then run in int64 — order-independent, identical
    across engines, no double->decimal rounding ties (which differ between
    Spark's HALF_UP BigDecimal cast and DuckDB's scaled-double rounding)."""
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: filter → groupBy(2) → 8 aggregates.
    Sums run over DECIMAL(18,4) (exact at any parallelism); averages are
    derived as double ratios of the exact sums."""
    li = load_table(spark, sf_dir, "lineitem")
    price_c, disc_p, tax_p = _cents("l_extendedprice"), _cents("l_discount"), _cents("l_tax")
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents("l_quantity")).alias("_sum_qty_c"),
            F.sum(price_c).alias("_sum_base_c"),
            F.sum(price_c * (F.lit(100) - disc_p)).alias("_sum_disc_e4"),
            F.sum(price_c * (F.lit(100) - disc_p) * (F.lit(100) + tax_p)).alias("_sum_charge_e6"),
            F.count("*").alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("_sum_qty_c").cast("double") / F.lit(100.0)).alias("sum_qty"),
        (F.col("_sum_base_c").cast("double") / F.lit(100.0)).alias("sum_base_price"),
        (F.col("_sum_disc_e4").cast("double") / F.lit(10000.0)).alias("sum_disc_price"),
        (F.col("_sum_charge_e6").cast("double") / F.lit(1000000.0)).alias("sum_charge"),
        F.round(F.col("_sum_qty_c").cast("double") / F.lit(100.0) / F.col("count_order"), 6).alias("avg_qty"),
        F.round(F.col("_sum_base_c").cast("double") / F.lit(100.0) / F.col("count_order"), 6).alias("avg_price"),
        "count_order",
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: 3-way join, grouped revenue, top-10.
    customer is broadcast (small dim); orders⋈lineitem is fact-fact, so
    it is PINNED to a sort-merge shuffle join — at sf0.1 the pruned
    lineitem projection slips under the broadcast threshold and
    Catalyst would happily broadcast a fact table (measured 2.3× slower
    here, OOM at 100 TB); AQE may still demote to broadcast at runtime
    if a side is genuinely tiny. Revenue decimal-exact; top-10 order
    deterministic via the unique o_orderkey tiebreak."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "FURNITURE")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue_e4 = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(revenue_e4).alias("_rev_e4")
    )
    top = agg.orderBy(F.col("_rev_e4").desc(), F.col("o_orderkey")).limit(10)
    return top.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
        (F.col("_rev_e4").cast("double") / F.lit(10000.0)).alias("revenue"),
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier revenue per nation: 5-way join with
    all dimension sides broadcast; only lineitem⋈orders shuffles — that
    fact-fact join is pinned to sort-merge so small-SF stats can't flip
    it to a fact broadcast."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue_e4 = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    dim = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    joined = (
        li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(dim), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    agg = joined.groupBy("n_name").agg(F.sum(revenue_e4).alias("_rev_e4"))
    return agg.select(
        "n_name", (F.col("_rev_e4").cast("double") / F.lit(10000.0)).alias("revenue")
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast-revenue: pure scan-filter-aggregate; every
    predicate is parquet-pushable, result is a single exact decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    rev_e4 = _cents("l_extendedprice") * _cents("l_discount")
    agg = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.sum(rev_e4).alias("_rev_e4"), F.count("*").alias("n_items"))
    return agg.select(
        (F.col("_rev_e4").cast("double") / F.lit(10000.0)).alias("revenue"), "n_items"
    )


def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 events per type by value: rank within partition — the scan
    shuffles once on the group key; no global sort."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "event_id", "value", "rn")
    )


def window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function surface: rank / lag / lead / running sum over a
    per-user event timeline (absent from the reference, SURVEY.md §2.9)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("seq"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).over(w).cast("double")
         / F.lit(100.0)).alias("running_value"),
    )


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user 30-minute-gap sessions via lag + cumulative
    sum of session starts — one shuffle on user_id, linear per partition."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = events.withColumn(
        "new_session",
        (
            F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w) > 1800
        ).cast("int"),
    ).withColumn("new_session", F.coalesce("new_session", F.lit(1)))
    sess = gapped.withColumn("session_id", F.sum("new_session").over(w))
    return sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (F.session_window): dynamic-gap windows
    merged by the engine — the streaming-capable twin of `sessionize`
    (same gap rule; runs unchanged under readStream + watermark).
    An event exactly gap seconds after the last starts a NEW session
    (window end is exclusive)."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    return agg.select(
        "user_id",
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation surface: (user, day) pairs with a click but no
    purchase (EXCEPT == left anti join in the physical plan)."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    clickers = events.filter(F.col("event_type") == "click").select("user_id", day).distinct()
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id", day).distinct()
    return clickers.exceptAll(buyers).distinct()


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation surface: (user, day) pairs with BOTH a click and a
    purchase (INTERSECT == left semi join in the physical plan)."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    clickers = events.filter(F.col("event_type") == "click").select("user_id", day).distinct()
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id", day).distinct()
    return clickers.intersect(buyers)


def global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY ... LIMIT k — the one total-order query shape.
    Catalyst plans this as TakeOrderedAndProject: each partition keeps a
    k-row heap and the driver merges k·P rows, so NO full sort and no
    single-partition shuffle of the whole table ever happens — the only
    ORDER BY formulation that survives 100 TB. Tiebreak on event_id
    makes the k-set deterministic under value ties."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_id", "user_id", "event_type", "value")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(100)
    )


def rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set aggregation (absent from the reference)."""
    events = load_table(spark, sf_dir, "events")
    return events.rollup("event_type").agg(F.count("*").alias("cnt"))


def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping-set aggregation over two dimensions — all four
    grouping sets in one pass (Spark expands then partially aggregates;
    no extra scan per set)."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    return events.cube("event_type", day).agg(F.count("*").alias("cnt"))


def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type count matrix with a fixed column set
    (explicit pivot values keep the schema static at any data scale)."""
    events = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def _asof_carried(spark: SparkSession, sf_dir: str):
    """Shared core of the as-of family: for every 'purchase' event,
    carry forward the user's latest preceding non-purchase touchpoint
    (id + timestamp) via the union+window trick — tag both sides,
    union, ONE window pass per user ordered by time. Shuffle-minimal
    (single exchange on the key), no range-duplication;
    `pd.merge_asof` inside applyInPandas is the fallback for
    semantics this trick can't express."""
    events = load_table(spark, sf_dir, "events")
    is_probe = (F.col("event_type") == "purchase").cast("int")
    tagged = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.col("event_id"),
        is_probe.alias("is_probe"),
    )
    # touchpoints sort before a probe at identical t (is_probe ASC), so
    # a touch exactly at purchase time is visible ("at-or-before")
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch_id = F.when(F.col("is_probe") == 0, F.col("event_id"))
    touch_t = F.when(F.col("is_probe") == 0, F.col("t"))
    return (
        tagged.withColumn("last_touch", F.last(touch_id, ignorenulls=True).over(w))
        .withColumn("last_touch_t", F.last(touch_t, ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
    )


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (no native Spark operator): attribute every purchase
    to the same user's latest at-or-before touchpoint event — the
    last-touch attribution shape. See _asof_carried for the
    union+window formulation and its scale properties."""
    return _asof_carried(spark, sf_dir).select(
        F.col("event_id").alias("purchase_id"),
        F.col("last_touch").alias("touch_id"),
    )


ASOF_TOL_HOURS = 24  # max attribution staleness for a valid match


def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound (the feature-store freshness
    rule / attribution window): same last-touch match as asof_join,
    but a touchpoint older than ASOF_TOL_HOURS is rejected — crediting
    a day-stale touch is worse than crediting none. Emits the match,
    its staleness in whole hours, and the freshness verdict. The
    matched timestamp rides the same single window pass, so the
    tolerance check is one in-row time diff — no second join."""
    carried = _asof_carried(spark, sf_dir)
    # microsecond-exact integers on BOTH engines: unix_timestamp would
    # truncate sub-second parts that DuckDB's epoch() keeps, flipping
    # hour-boundary verdicts
    staleness = F.expr(
        "(unix_micros(t) - unix_micros(last_touch_t)) div 3600000000"
    )
    fresh = staleness <= ASOF_TOL_HOURS
    return carried.select(
        F.col("event_id").alias("purchase_id"),
        F.when(fresh, F.col("last_touch")).alias("touch_id"),
        F.when(F.col("last_touch").isNotNull(), staleness).alias("staleness_hours"),
        (F.col("last_touch").isNotNull() & fresh).cast("int").alias("is_fresh"),
    )


def attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-model attribution in one pass: for every purchase, the
    user's FIRST at-or-before touchpoint (first-touch model), the
    LATEST (last-touch — asof_join's model), and the prior-touch count
    (the denominator linear attribution credits 1/n by). Emitting all
    three from one frame is the point: marketing analytics compares
    models on the same events, and computing each with its own scan
    would triple the cost and risk skew between them.

    Shape: the asof family's union+window trick (one exchange on
    user_id, touchpoints sorting before probes at equal timestamps),
    with first/last/count as THREE window aggregates over the SAME
    ordered frame — Spark evaluates them in one window operator, so
    the marginal models are free. No range join, no duplication."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    is_probe = (F.col("event_type") == "purchase").cast("int")
    tagged = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.col("event_id"),
        is_probe.alias("is_probe"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch_id = F.when(F.col("is_probe") == 0, F.col("event_id"))
    return (
        tagged.withColumn("first_touch_id", F.first(touch_id, ignorenulls=True).over(w))
        .withColumn("last_touch_id", F.last(touch_id, ignorenulls=True).over(w))
        .withColumn(
            "n_prior_touches",
            F.sum((F.col("is_probe") == 0).cast("long")).over(w),
        )
        .filter(F.col("is_probe") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("k").alias("user_id"),
            "first_touch_id",
            "last_touch_id",
            "n_prior_touches",
            (
                F.col("first_touch_id").isNotNull()
                & (F.col("first_touch_id") == F.col("last_touch_id"))
            ).cast("int").alias("single_touch"),
        )
    )


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation: users and days per event type.
    Spark expands count_distinct into a two-phase partial-dedup agg —
    map-side distinct before the shuffle, so the exchange carries only
    unique (type, user) pairs."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count_distinct(F.date_format("ts", "yyyy-MM-dd")).alias("n_days"),
        F.count("*").alias("n_events"),
    )


#: approx_distinct_counts error band, ppm of the exact count. Equal to
#: the sketch's configured rsd (2%); measured error on the fixture
#: corpus is 0 ppm at sf0.001/0.01 (HLL++ sparse mode is exact at low
#: cardinality) and 4000 ppm at sf0.1 — 5× headroom, while a broken
#: sketch is off by orders of magnitude.
ADC_BAND_PPM = 20_000


def approx_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct sketch, SELF-AUDITING: the 100 TB path
    where the exact two-phase distinct's shuffle of unique pairs is
    itself too big. Fixed-size sketch per group, mergeable map-side —
    constant memory at any cardinality.

    The raw estimate can never hash-match a DuckDB oracle (engine HLLs
    differ), so — the audit-twin pattern of hll_distinct_report — the
    key outputs the exact count plus the estimate's GUARANTEE: a
    within-ADC_BAND_PPM verdict on Spark's native approx_count_distinct
    (rsd 0.02), which the oracle pins to 1. A sketch regression flips
    the flag and hash-mismatches instead of hiding behind a rows-only
    check. The exact column doubles as the accuracy anchor the old
    pytest pinned externally.

    Shape: ONE map-side-combined aggregate carries both the sketch
    registers and the exact distinct; at true 100 TB the exact anchor
    is the expensive half — this key is the VALIDATION run, the
    production path calls the sketch alone."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        F.count_distinct("user_id").alias("n_users_exact"),
        F.count("*").alias("n_events"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "n_users_exact",
        F.expr(
            f"CAST(abs(_approx - n_users_exact) * 1000000"
            f" div n_users_exact <= {ADC_BAND_PPM} AS INT)"
        ).alias("hll_within_band"),
    )


SALT_BUCKETS = 8


def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact-dim join: the fact side gets a deterministic
    salt (event_id mod 8), the dim side is exploded 8x, and the join key
    becomes (key, salt) — a hot key's rows now land on 8 reducers
    instead of 1. shuffle_hash hint keeps it a shuffle join so the
    pattern is actually exercised (a dim this small would otherwise
    broadcast — which is the FIRST fix for skew; salting is for when
    both sides are too big to broadcast). Result equals the plain join,
    which is exactly what the oracle checks."""
    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    fact = events.withColumn("salt", F.pmod("event_id", F.lit(SALT_BUCKETS)))
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))).alias("salt"),
    )
    joined = fact.join(
        dim.hint("shuffle_hash"),
        (fact.user_id == dim.c_custkey) & (fact.salt == dim.salt),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


_CDC_T0 = "2024-01-02 00:00:00"  # snapshot/change-batch boundary
_SKEW_TOP = 20


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse each
    user's event stream into change intervals — one row per run of a
    constant event_type with [valid_from, valid_to) bounds and an
    is_current flag. The warehouse pattern for turning a CDC stream
    into a queryable dimension history.

    Shape: ONE shuffle on user_id serves both windows (change
    detection via lag, interval close via lead on the filtered change
    rows — same partitioning, Spark reuses the exchange). Linear per
    partition; per-user history length bounds the sort, not corpus
    size. Determinism: (ts, event_id) is a unique order key."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        events.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    out = chg.withColumn("valid_to", F.lead("valid_from").over(w2))
    return out.select(
        "user_id",
        "event_type",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().cast("int").alias("is_current"),
    )


def cdc_merge_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE (Delta-style MERGE INTO, upsert + delete): apply a
    change batch (events at/after T0) onto a base snapshot (latest
    state per user before T0), where event_type='error' is a DELETE
    and anything else UPSERTs (ts, type, value). Last writer wins by
    (ts, event_id).

    Shape: each side collapses to latest-per-key with max_by — a TRUE
    aggregate with map-side partial combine, not a row_number window,
    so the shuffle carries one row per key per map partition, not the
    raw stream. The merge itself is a full-outer join on user_id
    (both sides already key-partitioned — one co-located join). The
    oracle states the semantic contract (latest overall event, absent
    if it is a delete), which the merge provably equals."""
    events = load_table(spark, sf_dir, "events")

    def latest(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.max_by(
                F.struct("ts", "event_type", "value"),
                F.struct("ts", "event_id"),
            ).alias("s")
        ).select("user_id", "s.ts", "s.event_type", "s.value")

    base = latest(events.filter(F.col("ts") < F.lit(_CDC_T0))).filter(
        F.col("event_type") != "error"
    )
    chg = latest(events.filter(F.col("ts") >= F.lit(_CDC_T0)))
    b = base.select(
        "user_id",
        F.col("ts").alias("b_ts"),
        F.col("event_type").alias("b_type"),
        F.col("value").alias("b_value"),
    )
    merged = b.join(chg, "user_id", "full_outer")
    take_chg = F.col("ts").isNotNull()
    return (
        merged.filter(
            F.when(take_chg, F.col("event_type") != "error").otherwise(F.lit(True))
        )
        .select(
            "user_id",
            F.when(take_chg, F.col("ts")).otherwise(F.col("b_ts")).alias("last_ts"),
            F.when(take_chg, F.col("event_type"))
            .otherwise(F.col("b_type"))
            .alias("last_type"),
            F.when(take_chg, F.col("value"))
            .otherwise(F.col("b_value"))
            .alias("last_value"),
        )
    )


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter profile of the events key distribution: top-20
    user_ids by event count with exact integer-ppm share of the total
    — the diagnostic that decides whether a downstream keyed join
    needs salting/AQE skew handling BEFORE it melts a task.

    Shape: one map-side-combined groupBy(user_id), the total rides a
    broadcast 1-row aggregate, and the top-k is
    TakeOrderedAndProject (per-partition heaps + driver merge — no
    global sort at any key cardinality)."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    ranked = (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "cnt",
            F.expr("cnt * 1000000 div total").alias("share_ppm"),
        )
        .orderBy(F.col("cnt").desc(), "user_id")
        .limit(_SKEW_TOP)
    )
    w = Window.orderBy(F.col("cnt").desc(), "user_id")
    return ranked.withColumn("rank", F.row_number().over(w))


QUERIES = {
    # sessionize first: round 1's budget-truncated driver run never
    # reached it (it was the one red key) — keep it inside the first
    # ~50 keys so the driver re-verifies the fix even under a budget.
    "sessionize": sessionize,
    "tpch_q1": tpch_q1,
    "tpch_q3": tpch_q3,
    "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6,
    "top_k_per_group": top_k_per_group,
    "window_functions": window_functions,
    "session_window_agg": session_window_agg,
    "set_except": set_except,
    "set_intersect": set_intersect,
    "global_topk": global_topk,
    "rollup_counts": rollup_counts,
    "cube_counts": cube_counts,
    "pivot_counts": pivot_counts,
    "asof_join": asof_join,
    "attribution_first_last": attribution_first_last,
    "asof_join_tolerance": asof_join_tolerance,
    "distinct_counts": distinct_counts,
    "approx_distinct_counts": approx_distinct_counts,
    "salted_skew_join": salted_skew_join,
    "scd2_history": scd2_history,
    "cdc_merge_latest": cdc_merge_latest,
    "key_skew_profile": key_skew_profile,
}

ORACLE = {
    "tpch_q1": """
        WITH c AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
                 CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc,
                 CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS dp,
                 CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT) AS tp
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '1998-09-01'),
        a AS (
          SELECT l_returnflag, l_linestatus,
                 SUM(qc) AS sqc, SUM(pc) AS sbc,
                 SUM(pc * (100 - dp)) AS sde4,
                 SUM(pc * (100 - dp) * (100 + tp)) AS sce6,
                 COUNT(*) AS count_order
          FROM c GROUP BY 1, 2)
        SELECT l_returnflag, l_linestatus,
               CAST(sqc AS DOUBLE) / 100.0 AS sum_qty,
               CAST(sbc AS DOUBLE) / 100.0 AS sum_base_price,
               CAST(sde4 AS DOUBLE) / 10000.0 AS sum_disc_price,
               CAST(sce6 AS DOUBLE) / 1000000.0 AS sum_charge,
               ROUND(CAST(sqc AS DOUBLE) / 100.0 / count_order, 6) AS avg_qty,
               ROUND(CAST(sbc AS DOUBLE) / 100.0 / count_order, 6) AS avg_price,
               count_order
        FROM a
    """,
    "tpch_q3": """
        SELECT o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o.o_orderpriority,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
                        (100 - CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'FURNITURE'
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2, 3
        ORDER BY SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
                     (100 - CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT))) DESC,
                 o.o_orderkey
        LIMIT 10
    """,
    "tpch_q5": """
        SELECT n.n_name,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) *
                        (100 - CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        WHERE c.c_nationkey = s.s_nationkey
        GROUP BY 1
    """,
    "tpch_q6": """
        SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) *
                        CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 10000.0 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "top_k_per_group": """
        SELECT event_type, event_id, "value", rn FROM (
          SELECT event_type, event_id, "value",
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY "value" DESC, event_id) AS rn
          FROM events)
        WHERE rn <= 5
    """,
    "window_functions": """
        SELECT user_id, event_id,
               ROW_NUMBER() OVER w AS seq,
               LAG(event_type) OVER w AS prev_type,
               LEAD(event_type) OVER w AS next_type,
               CAST(SUM(CAST(FLOOR("value" * 100 + 0.5) AS BIGINT)) OVER w AS DOUBLE)
                 / 100.0 AS running_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "sessionize": """
        WITH g AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN CAST(epoch(date_trunc('second', ts)) AS BIGINT) -
                           LAG(CAST(epoch(date_trunc('second', ts)) AS BIGINT))
                             OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                      THEN 1
                      WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events),
        s AS (
          SELECT user_id,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM g)
        SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        FROM s GROUP BY 1
    """,
    "session_window_agg": """
        WITH g AS (
          SELECT user_id, ts,
                 -- microsecond-exact gap test: Spark's session_window
                 -- merges on full timestamp precision, so second-level
                 -- truncation here flips events that sit within 1 s of
                 -- the 30 min boundary (one such pair exists at sf0.1)
                 CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                      WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                           >= 1800000000 THEN 1
                      ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM g)
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
               COUNT(*) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    "set_except": """
        SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'purchase'
    """,
    "set_intersect": """
        SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
        FROM events WHERE event_type = 'purchase'
    """,
    "global_topk": """
        SELECT event_id, user_id, event_type, value
        FROM events
        ORDER BY value DESC, event_id ASC
        LIMIT 100
    """,
    "rollup_counts": """
        SELECT event_type, COUNT(*) AS cnt
        FROM events GROUP BY ROLLUP(event_type)
    """,
    "cube_counts": """
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS cnt
        FROM events GROUP BY CUBE(event_type, strftime(ts, '%Y-%m-%d'))
    """,
    "pivot_counts": """
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events GROUP BY user_id
    """,
    "attribution_first_last": """
        WITH tagged AS (
          SELECT user_id AS k, ts AS t, event_id,
                 CAST(event_type = 'purchase' AS INT) AS is_probe,
                 CASE WHEN event_type <> 'purchase' THEN event_id END AS touch
          FROM events),
        marked AS (
          SELECT k, event_id, is_probe,
                 FIRST_VALUE(touch IGNORE NULLS) OVER w AS first_touch_id,
                 LAST_VALUE(touch IGNORE NULLS) OVER w AS last_touch_id,
                 CAST(SUM(1 - is_probe) OVER w AS BIGINT) AS n_prior_touches
          FROM tagged
          WINDOW w AS (PARTITION BY k ORDER BY t, is_probe, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_id AS purchase_id, k AS user_id,
               first_touch_id, last_touch_id, n_prior_touches,
               CAST(first_touch_id IS NOT NULL
                    AND first_touch_id = last_touch_id AS INT) AS single_touch
        FROM marked WHERE is_probe = 1
    """,
    # Explicit tie-break (ADVICE r4): DuckDB's ASOF JOIN leaves the pick
    # among equal-max-ts touches unspecified, while the Spark window
    # deterministically takes the max event_id at that ts — so the
    # oracle spells the same (ts DESC, event_id DESC) top-1 out as a
    # lateral instead of relying on ASOF.
    "asof_join": """
        SELECT p.event_id AS purchase_id, t.event_id AS touch_id
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'purchase') p
        LEFT JOIN LATERAL (
          SELECT event_id FROM events e
          WHERE e.event_type <> 'purchase'
            AND e.user_id = p.user_id AND e.ts <= p.ts
          ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) t ON TRUE
    """,
    "asof_join_tolerance": f"""
        WITH m AS (
          SELECT p.event_id AS purchase_id, t.event_id AS touch,
                 (epoch_us(p.ts) - epoch_us(t.ts)) // 3600000000
                   AS staleness_hours
          FROM (SELECT user_id, ts, event_id FROM events
                WHERE event_type = 'purchase') p
          LEFT JOIN LATERAL (
            SELECT event_id, ts FROM events e
            WHERE e.event_type <> 'purchase'
              AND e.user_id = p.user_id AND e.ts <= p.ts
            ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) t ON TRUE)
        SELECT purchase_id,
               CASE WHEN staleness_hours <= {ASOF_TOL_HOURS} THEN touch END
                 AS touch_id,
               CASE WHEN touch IS NOT NULL THEN staleness_hours END
                 AS staleness_hours,
               CAST(touch IS NOT NULL AND staleness_hours <= {ASOF_TOL_HOURS}
                    AS INT) AS is_fresh
        FROM m
    """,
    "distinct_counts": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days,
               COUNT(*) AS n_events
        FROM events GROUP BY 1
    """,
    # approx_distinct_counts: the estimate itself can't cross engines
    # (HLL sketches differ), so the key outputs exact counts + the
    # within-band verdict, which the oracle pins to 1.
    "approx_distinct_counts": """
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users_exact,
               CAST(1 AS INT) AS hll_within_band
        FROM events GROUP BY 1
    """,
    "salted_skew_join": """
        SELECT c.c_mktsegment,
               COUNT(*) AS n_events,
               COUNT(DISTINCT e.user_id) AS n_users
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
    """,
}

ORACLE["scd2_history"] = """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
    chg AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM ordered WHERE prev IS NULL OR prev <> event_type)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (
             PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to,
           CAST(lead(valid_from) OVER (
             PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL
             AS INT) AS is_current
    FROM chg
"""

# Semantic contract of the merge: latest event per user overall,
# absent when that latest event is a delete ('error'). The Spark side
# computes it as snapshot + change-batch MERGE; the two are equal by
# last-writer-wins.
ORACLE["cdc_merge_latest"] = """
    SELECT user_id, ts AS last_ts, event_type AS last_type,
           value AS last_value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1 AND event_type <> 'error'
"""

ORACLE["key_skew_profile"] = f"""
    WITH counts AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
    total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts),
    ranked AS (
      SELECT user_id, cnt,
             CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm
      FROM counts CROSS JOIN total
      ORDER BY cnt DESC, user_id LIMIT {_SKEW_TOP})
    SELECT user_id, cnt, share_ppm,
           CAST(row_number() OVER (ORDER BY cnt DESC, user_id) AS INT) AS rank
    FROM ranked
"""


# --- Runtime-filter semi-join (explicit Bloom bitmap) -----------------

_BLOOM_BITS_PER_KEY = 4  # m = 4 * build-side NDV (fill ~0.39 at k=2)
_BLOOM_K = 2  # hash functions: two 8-hex slices of one md5


def bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter semi-join with pruning observability: build a
    Bloom bitmap from the DISTINCT event users (the small side), prune
    the customer scan with it map-side, then verify against the exact
    semi-join and report per-segment pruning and false-positive rates
    — the classic 100 TB pattern (Spark's own
    spark.sql.optimizer.runtime.bloomFilter does this inside the
    optimizer; this operator makes the mechanism explicit and
    measurable, the way engines surface runtime-filter efficacy).

    The filter is sized from the build side's exact NDV (m = 4·U,
    k = 2), as production runtime filters size from NDV estimates — a
    fixed width would saturate (prune nothing) or overshoot (zero
    false positives, untestable) as the corpus scales; proportional
    sizing keeps fill ≈ 0.39 and FP ≈ 15% at every SF, so every report
    column stays live.

    Shape: build-side distinct is a shuffle of the SMALL side only;
    the bitmap is assembled distributedly (groupBy word → bit_or, ≤
    m/32 rows) and collapses to ONE broadcast row (map word→bits, a
    few KB) — the probe scan then filters map-side with two O(1) bit
    tests and NEVER shuffles. The verification join broadcasts the
    build keys (they fit by construction — a bloom only makes sense
    when the build side is small). Fact table: never shuffled at all.
    Cross-engine determinism: md5 slices, exact integer ppm."""
    users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct()
    )
    m_row = users.agg(
        (F.count("*") * _BLOOM_BITS_PER_KEY).alias("m")
    )
    # Two bit positions per key: md5 hex chars 1-8 and 9-16, mod m.
    hx = F.md5(F.col("user_id").cast("string"))
    bits = (
        users.crossJoin(F.broadcast(m_row))
        .select(
            F.explode(
                F.array(
                    *[
                        F.conv(F.substring(hx, 1 + 8 * i, 8), 16, 10)
                        .cast("long")
                        .alias("h")
                        for i in range(_BLOOM_K)
                    ]
                ).alias("hs")
            ).alias("h"),
            "m",
        )
        .select((F.col("h") % F.col("m")).alias("pos"))
        .distinct()
    )
    words = bits.groupBy(
        F.expr("CAST(pos div 32 AS INT)").alias("word")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
        ).alias("wbits")
    )
    bloom = words.agg(
        F.map_from_arrays(
            F.collect_list("word"), F.collect_list("wbits")
        ).alias("bm")
    ).crossJoin(F.broadcast(m_row))

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    chx = F.md5(F.col("c_custkey").cast("string"))
    probed = cust.crossJoin(F.broadcast(bloom))
    for i in range(_BLOOM_K):
        probed = probed.withColumn(
            f"_h{i}",
            F.conv(F.substring(chx, 1 + 8 * i, 8), 16, 10).cast("long")
            % F.col("m"),
        )
    for i in range(_BLOOM_K):
        probed = probed.withColumn(
            f"_set{i}",
            (
                F.coalesce(
                    F.element_at("bm", F.expr(f"CAST(_h{i} div 32 AS INT)")),
                    F.lit(0).cast("long"),
                ).bitwiseAND(
                    F.expr(
                        f"shiftleft(CAST(1 AS BIGINT), CAST(_h{i} % 32 AS INT))"
                    )
                )
                != 0
            ),
        )
    flagged = (
        probed.withColumn("bloom_pass", F.col("_set0") & F.col("_set1"))
        .join(
            F.broadcast(users.withColumnRenamed("user_id", "c_custkey")).withColumn(
                "is_match", F.lit(True)
            ),
            "c_custkey",
            "left",
        )
        .withColumn("is_match", F.coalesce("is_match", F.lit(False)))
    )
    return (
        flagged.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.col("bloom_pass").cast("long")).alias("n_pass"),
            F.sum(F.col("is_match").cast("long")).alias("n_match"),
            F.sum(
                (F.col("bloom_pass") & ~F.col("is_match")).cast("long")
            ).alias("n_false_pos"),
        )
        .withColumn(
            "pruned_ppm", F.expr("(n_cust - n_pass) * 1000000 div n_cust")
        )
        .withColumn(
            "fp_ppm", F.expr("n_false_pos * 1000000 div greatest(n_pass, 1)")
        )
    )


QUERIES["bloom_semi_join"] = bloom_semi_join
ORACLE["bloom_semi_join"] = f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    mm AS (SELECT CAST({_BLOOM_BITS_PER_KEY} * COUNT(*) AS BIGINT) AS m FROM u),
    bits AS (
      SELECT DISTINCT
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1 + 8*i, 8))::BIGINT
               % (SELECT m FROM mm) AS pos
      FROM u, UNNEST([0, 1]) AS t(i)),
    probed AS (
      SELECT c_custkey, c_mktsegment,
             ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
               % (SELECT m FROM mm) AS h0,
             ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8))::BIGINT
               % (SELECT m FROM mm) AS h1
      FROM customer),
    flagged AS (
      SELECT c_mktsegment,
             (h0 IN (SELECT pos FROM bits)
              AND h1 IN (SELECT pos FROM bits)) AS bloom_pass,
             c_custkey IN (SELECT user_id FROM u) AS is_match
      FROM probed),
    agg AS (
      SELECT c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
             CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
             CAST(SUM(CASE WHEN bloom_pass AND NOT is_match THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_false_pos
      FROM flagged GROUP BY 1)
    SELECT c_mktsegment, n_cust, n_pass, n_match, n_false_pos,
           (n_cust - n_pass) * 1000000 // n_cust AS pruned_ppm,
           n_false_pos * 1000000 // greatest(n_pass, 1) AS fp_ppm
    FROM agg
"""


# --- Referential-integrity audit --------------------------------------

#: (child_table, fk_col, parent_table, pk_col) — the corpus's star
#: edges.
_FK_EDGES = (
    ("events", "user_id", "customer", "c_custkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
)


def fk_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity + coverage audit over the star schema:
    one row per foreign-key edge with both failure directions — child
    rows whose key has no parent (orphans: broken loads, the classic
    FK violation) AND parent keys no child references (dead dimension
    rows: retention bugs, over-wide snapshots). ANSI FK checks don't
    exist in a lake; this is the scalable substitute a warehouse runs
    after every load. This corpus is referentially intact, so the
    orphan columns pin ZERO on every edge (a broken orphan predicate
    would light them up), while the coverage direction is live:
    events touch 150 of the 1 500 customers and lineitem references
    14 743 of 15 000 orders, so `n_unreferenced_parents` is non-zero
    where it should be and zero where every parent is used
    (part/supplier/nation).

    Shape per edge: the child aggregates to (key, n_rows) FIRST — a
    map-side-combined groupBy whose output is key-cardinality-sized —
    then FULL-outer-joins the parent's distinct key set and reduces to
    ONE summary row; fact rows never meet the join, only distinct
    keys do, and one join serves both directions. Key sets stay
    shuffle joins in the plan (corpus-proportional; AQE may broadcast
    small ones at runtime). The six 1-row summaries union at the end.
    """
    out = None
    for child, fk, parent, pk in _FK_EDGES:
        ck = (
            load_table(spark, sf_dir, child)
            .groupBy(F.col(fk).alias("k"))
            .agg(F.count("*").alias("n_rows"))
        )
        pk_keys = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("_present", F.lit(1))
        )
        joined = ck.join(pk_keys, "k", "full")
        orphan = F.col("_present").isNull()
        unref = F.col("n_rows").isNull()
        summary = joined.agg(
            F.lit(f"{child}.{fk}").alias("fk_edge"),
            F.lit(f"{parent}.{pk}").alias("parent_key"),
            F.sum("n_rows").alias("n_child_rows"),
            F.sum((~unref).cast("long")).alias("n_child_keys"),
            F.sum(orphan.cast("long")).alias("n_orphan_keys"),
            F.sum(F.when(orphan, F.col("n_rows")).otherwise(F.lit(0))).alias(
                "n_orphan_rows"
            ),
            F.sum(F.col("_present").cast("long")).alias("n_parent_keys"),
            F.sum((unref & ~orphan).cast("long")).alias("n_unreferenced_parents"),
        ).withColumn(
            "orphan_row_ppm",
            F.expr("n_orphan_rows * 1000000 div n_child_rows"),
        ).withColumn(
            "parent_coverage_ppm",
            F.expr(
                "(n_parent_keys - n_unreferenced_parents) * 1000000"
                " div n_parent_keys"
            ),
        )
        out = summary if out is None else out.unionAll(summary)
    return out


QUERIES["fk_integrity_report"] = fk_integrity_report


def _fk_oracle() -> str:
    parts = []
    for child, fk, parent, pk in _FK_EDGES:
        parts.append(f"""
    SELECT '{child}.{fk}' AS fk_edge, '{parent}.{pk}' AS parent_key,
           CAST(SUM(n_rows) AS BIGINT) AS n_child_rows,
           CAST(SUM(CASE WHEN n_rows IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_child_keys,
           CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphan_keys,
           CAST(COALESCE(SUM(CASE WHEN p.k IS NULL THEN n_rows END), 0) AS BIGINT)
             AS n_orphan_rows,
           CAST(SUM(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_parent_keys,
           CAST(SUM(CASE WHEN n_rows IS NULL AND p.k IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unreferenced_parents,
           CAST(COALESCE(SUM(CASE WHEN p.k IS NULL THEN n_rows END), 0) AS BIGINT)
             * 1000000 // CAST(SUM(n_rows) AS BIGINT) AS orphan_row_ppm,
           (CAST(SUM(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
              - CAST(SUM(CASE WHEN n_rows IS NULL AND p.k IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT))
             * 1000000
             // CAST(SUM(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS parent_coverage_ppm
    FROM (SELECT {fk} AS k, COUNT(*) AS n_rows FROM {child} GROUP BY 1) c
    FULL JOIN (SELECT DISTINCT {pk} AS k FROM {parent}) p USING (k)""")
    return "\nUNION ALL\n".join(parts)


ORACLE["fk_integrity_report"] = _fk_oracle()


# --- Order-to-ship lag distribution ------------------------------------

_LAG_PCTS = (50, 90, 99)


def shipping_lag_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lag distribution per order priority: item counts,
    negative-lag count (ship date BEFORE order date — the upstream
    data bug this corpus genuinely contains, so the DQ column is
    live), min/max, and exact nearest-rank p50/p90/p99 in days. The
    fulfillment-latency SLA report plus its data-quality sentinel in
    one pass.

    Shape: the fact-fact lineitem⋈orders join computes the lag, then
    everything reduces through the (priority, lag_days) HISTOGRAM —
    bounded by distinct lag values (date-range-bounded, corpus-size-
    independent), the same no-big-sort trick as vocab_prune_sweep.
    Percentiles come from the histogram's running counts: nearest
    rank cum ≥ ceil(p·N/100) expressed as the integer comparison
    cum·100 ≥ p·N, so no float quantiles and no per-priority sort of
    fact rows; the window runs over the tiny histogram frame."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    hist = (
        li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        .select("o_orderpriority", lag.alias("lag_days"))
        .groupBy("o_orderpriority", "lag_days")
        .agg(F.count("*").alias("n"))
    )
    w_cum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("lag_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("o_orderpriority").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "o_orderpriority",
        "lag_days",
        "n",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("n").over(w_tot).alias("total"),
    )
    aggs = [
        F.max("total").alias("n_items"),
        F.sum(F.when(F.col("lag_days") < 0, F.col("n")).otherwise(F.lit(0))).alias(
            "n_negative"
        ),
        F.min("lag_days").alias("min_lag"),
        F.max("lag_days").alias("max_lag"),
    ]
    for p in _LAG_PCTS:
        aggs.append(
            F.min(
                F.when(F.col("cum_n") * 100 >= F.lit(p) * F.col("total"), F.col("lag_days"))
            ).alias(f"p{p}_lag")
        )
    return cum.groupBy("o_orderpriority").agg(*aggs)


QUERIES["shipping_lag_report"] = shipping_lag_report
ORACLE["shipping_lag_report"] = f"""
    WITH lags AS (
      SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    hist AS (
      SELECT o_orderpriority, lag_days, COUNT(*) AS n
      FROM lags GROUP BY 1, 2),
    cum AS (
      SELECT o_orderpriority, lag_days, n,
             SUM(n) OVER (PARTITION BY o_orderpriority ORDER BY lag_days) AS cum_n,
             SUM(n) OVER (PARTITION BY o_orderpriority) AS total
      FROM hist)
    SELECT o_orderpriority,
           CAST(MAX(total) AS BIGINT) AS n_items,
           CAST(SUM(CASE WHEN lag_days < 0 THEN n ELSE 0 END) AS BIGINT)
             AS n_negative,
           CAST(MIN(lag_days) AS INT) AS min_lag,
           CAST(MAX(lag_days) AS INT) AS max_lag,
           {", ".join(
             f"CAST(MIN(CASE WHEN cum_n * 100 >= {p} * total THEN lag_days END) AS INT) AS p{p}_lag"
             for p in _LAG_PCTS)}
    FROM cum GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Join-explosion audit (round 8)
# ---------------------------------------------------------------------------

#: (edge label, left table, left key, right table, right key) for
#: join_explosion_audit. The events x orders edge is the accidental-
#: amplification case (both sides multi-row per key); the two TPC-H
#: edges are the sane many-to-one baselines.
JE_EDGES = (
    ("events.user_id x orders.o_custkey", "events", "user_id", "orders", "o_custkey"),
    ("lineitem.l_orderkey x orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey x part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
)


def join_explosion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-cardinality audit per declared join edge: the output
    row count an equi-join WOULD produce (sum over matched keys of
    c_left*c_right — exact, not an estimate), the hottest key's pair
    count, and the amplification vs the larger input in ppm — the
    check a pipeline owner runs BEFORE submitting a join that might be
    quadratic in a hot key (the events x orders edge here is exactly
    that shape: both sides carry many rows per user). A planner
    estimates this from sketches; at review time the exact number from
    two count aggregates is cheaper than one exploded join.

    Shape: per edge, each side collapses to its per-key COUNT frame
    (map-side combined), the two count frames join on the key — rows
    are (key, long), never payloads — and one aggregate emits the
    audit row. Products and pair sums route through DECIMAL(38,0):
    c_l*c_r summed corpus-wide overflows BIGINT exactly when the audit
    matters most. At 100 TB the only data-sized stages are the two
    initial scans."""
    rows = None
    for label, lt, lk, rt, rk in JE_EDGES:
        left = (
            load_table(spark, sf_dir, lt)
            .groupBy(F.col(lk).alias("k"))
            .agg(F.count("*").alias("cl"))
        )
        right = (
            load_table(spark, sf_dir, rt)
            .groupBy(F.col(rk).alias("k"))
            .agg(F.count("*").alias("cr"))
        )
        ltot = left.agg(F.sum("cl").alias("n_left"))
        rtot = right.agg(F.sum("cr").alias("n_right"))
        edge = (
            left.join(right, "k")
            .agg(
                F.count("*").cast("long").alias("n_matched_keys"),
                F.sum(
                    F.col("cl").cast("decimal(38,0)") * F.col("cr")
                ).alias("_nj"),
                F.max(
                    F.col("cl").cast("decimal(38,0)") * F.col("cr")
                ).alias("_mx"),
            )
            .crossJoin(F.broadcast(ltot))
            .crossJoin(F.broadcast(rtot))
            .select(
                F.lit(label).alias("edge"),
                F.col("n_left").cast("long").alias("n_left"),
                F.col("n_right").cast("long").alias("n_right"),
                "n_matched_keys",
                F.col("_nj").cast("long").alias("n_join"),
                F.col("_mx").cast("long").alias("max_key_pairs"),
                F.expr(
                    "CAST(_nj * 1000000 div CAST(greatest(n_left, n_right)"
                    " AS DECIMAL(38,0)) AS BIGINT)"
                ).alias("amp_ppm"),
            )
        )
        rows = edge if rows is None else rows.unionByName(edge)
    return rows


QUERIES["join_explosion_audit"] = join_explosion_audit
_JE_EDGE_SQL = """
    SELECT '{label}' AS edge,
           CAST((SELECT SUM(cl) FROM l) AS BIGINT) AS n_left,
           CAST((SELECT SUM(cr) FROM r) AS BIGINT) AS n_right,
           CAST(COUNT(*) AS BIGINT) AS n_matched_keys,
           CAST(SUM(CAST(cl AS HUGEINT) * cr) AS BIGINT) AS n_join,
           CAST(MAX(CAST(cl AS HUGEINT) * cr) AS BIGINT) AS max_key_pairs,
           CAST(SUM(CAST(cl AS HUGEINT) * cr) * 1000000
                // GREATEST((SELECT SUM(cl) FROM l),
                            (SELECT SUM(cr) FROM r)) AS BIGINT) AS amp_ppm
    FROM l JOIN r USING (k)
"""
ORACLE["join_explosion_audit"] = "\nUNION ALL\n".join(
    f"""
    SELECT * FROM (
      WITH l AS (SELECT {lk} AS k, COUNT(*) AS cl FROM {lt} GROUP BY 1),
           r AS (SELECT {rk} AS k, COUNT(*) AS cr FROM {rt} GROUP BY 1)
      {_JE_EDGE_SQL.format(label=label)})
    """
    for label, lt, lk, rt, rk in JE_EDGES
)


def order_total_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation: recompute every order's total from
    its line items (extendedprice × (1−discount) × (1+tax), integer
    cents) and reconcile against o_totalprice, per order status —
    order counts, headerless/itemless orders, exact matches,
    mismatches with max and summed absolute drift, and the mismatch
    ppm. BOTH failure directions are live on this corpus (probed
    before wiring: at sf0.01, 14,743/15,000 orders drift from their
    recomputed total and 257 orders have no line items at all) — the
    reconciliation report a finance/DQ pipeline runs nightly, and the
    complement of fk_integrity_report (that key proves every line item
    has an order; this one proves every order's MONEY adds up).

    Not in the reference (single-stream demo, no joins across facts —
    SURVEY.md §2.9); data-quality extension in the audit family.

    Exactness: all money in integer cents via the shared floor(x·100
    +0.5) quantization; the product is quantized ONCE per line item
    (after the double multiply, which is IEEE-identical across
    engines for the same literal parenthesization).

    Shape: lineitem collapses per order (one corpus-sized map-side-
    combined shuffle), LEFT-joins orders on the orderkey hash (both
    sides data-sized at 100 TB — no broadcast), and reduces to a
    ≤3-row status rollup. ppm routes through DECIMAL(38,0)."""
    li = load_table(spark, sf_dir, "lineitem")
    calc = F.floor(
        F.col("l_extendedprice")
        * (F.lit(1) - F.col("l_discount"))
        * (F.lit(1) + F.col("l_tax"))
        * 100
        + F.lit(0.5)
    ).cast("long")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(calc).alias("calc_c"), F.count("*").alias("n_items")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", _cents("o_totalprice").alias("ot_c")
    )
    j = orders.join(
        per_order, orders.o_orderkey == per_order.l_orderkey, "left"
    ).select(
        "o_orderstatus",
        "ot_c",
        "calc_c",
        F.coalesce("n_items", F.lit(0)).alias("n_items"),
        F.when(
            F.col("calc_c").isNotNull(), F.abs(F.col("ot_c") - F.col("calc_c"))
        ).alias("adiff"),
    )
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum((F.col("n_items") == 0).cast("long")).alias("n_itemless"),
            F.sum((F.col("adiff") == 0).cast("long")).alias("n_exact"),
            F.sum((F.col("adiff") > 0).cast("long")).alias("n_mismatch"),
            F.max("adiff").alias("max_abs_diff_c"),
            F.sum("adiff").alias("sum_abs_diff_c"),
        )
        .select(
            "o_orderstatus",
            "n_orders",
            "n_itemless",
            "n_exact",
            "n_mismatch",
            F.col("max_abs_diff_c").cast("long").alias("max_abs_diff_c"),
            F.col("sum_abs_diff_c").cast("long").alias("sum_abs_diff_c"),
            F.expr(
                "CAST(CAST(n_mismatch AS DECIMAL(38,0)) * 1000000"
                " div n_orders AS BIGINT)"
            ).alias("mismatch_ppm"),
        )
    )


QUERIES["order_total_audit"] = order_total_audit
ORACLE["order_total_audit"] = """
    WITH per_order AS (
      SELECT l_orderkey,
             SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                            * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS calc_c,
             COUNT(*) AS n_items
      FROM lineitem GROUP BY 1),
    j AS (
      SELECT o.o_orderstatus,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS ot_c,
             p.calc_c,
             COALESCE(p.n_items, 0) AS n_items,
             CASE WHEN p.calc_c IS NOT NULL
                  THEN ABS(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                           - p.calc_c) END AS adiff
      FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey)
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN n_items = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_itemless,
           CAST(SUM(CASE WHEN adiff = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           CAST(SUM(CASE WHEN adiff > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mismatch,
           CAST(MAX(adiff) AS BIGINT) AS max_abs_diff_c,
           CAST(SUM(adiff) AS BIGINT) AS sum_abs_diff_c,
           CAST(CAST(SUM(CASE WHEN adiff > 0 THEN 1 ELSE 0 END) AS HUGEINT)
                * 1000000 // COUNT(*) AS BIGINT) AS mismatch_ppm
    FROM j GROUP BY o_orderstatus
"""


def backfill_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-gap backfill plan: the contiguous runs of calendar
    days inside the orders table's own [min, max] date span that have
    NO orders at all — each run is one backfill job (start_day,
    end_day, n_days). LIVE on the raw corpus (probed before wiring:
    6 missing single days at sf0.01, hundreds of multi-day islands in
    the sparse sf0.001 slice), so both the detection AND the
    run-length coalescing are exercised without planting. The
    partition-completeness check every scheduled-ingest pipeline runs
    before declaring a dataset queryable.

    Not in the reference (SURVEY.md §2.9); lake-operations extension
    in the compaction_plan/fk_integrity family.

    Shape: one map-side-combined distinct over (day) — the only
    corpus-sized step — then everything is calendar-bounded: the day
    grid explodes from a broadcast 1-row [min, max] aggregate via
    sequence() (no driver sync), the anti-join finds missing days,
    and the gaps-and-islands grouping (day − row_number) runs one
    window over the ≤|calendar| missing-day frame (plan-lint
    whitelisted, calendar class)."""
    orders = load_table(spark, sf_dir, "orders")
    days = orders.select(
        F.col("o_orderdate").cast("date").alias("d")
    ).distinct()
    bounds = days.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    grid = bounds.select(
        F.explode(F.sequence("mn", "mx")).alias("d")
    )
    missing = grid.join(days, "d", "left_anti")
    w = Window.orderBy("d")
    grp = F.date_sub(F.col("d"), F.row_number().over(w))
    return (
        missing.select("d", grp.alias("grp"))
        .groupBy("grp")
        .agg(
            F.min("d").alias("start_day"),
            F.max("d").alias("end_day"),
            F.count("*").alias("n_days"),
        )
        .select(
            # ISO strings: DuckDB DATE surfaces as datetime64 in pandas
            # while Spark dates stay objects — the driver's value hash
            # sees different renderings (the house rule for date
            # outputs: format in BOTH engines)
            F.col("start_day").cast("string").alias("start_day"),
            F.col("end_day").cast("string").alias("end_day"),
            "n_days",
        )
    )


QUERIES["backfill_planner"] = backfill_planner
ORACLE["backfill_planner"] = """
    WITH days AS (
      SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders),
    b AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM days),
    grid AS (
      SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS d
      FROM b),
    miss AS (
      SELECT d FROM grid WHERE d NOT IN (SELECT d FROM days)),
    g AS (
      SELECT d, d - CAST(ROW_NUMBER() OVER (ORDER BY d) AS INT) AS grp
      FROM miss)
    SELECT strftime(MIN(d), '%Y-%m-%d') AS start_day,
           strftime(MAX(d), '%Y-%m-%d') AS end_day,
           COUNT(*) AS n_days
    FROM g GROUP BY grp
"""


#: supplier_scorecard size: the business report is a top-k, so the
#: output is literal-k-bounded at any corpus size.
SSC_TOP_K = 20


def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-SSC_TOP_K supplier scorecard by net revenue: items shipped,
    exact revenue cents, return rate (ppm of items with
    l_returnflag = 'R'), mean order-to-ship lag in whole days, and the
    negative-lag item count (ship BEFORE order — the genuine DQ bug
    this corpus carries, live per supplier) — the vendor-review
    one-pager, joining the procurement view (revenue, returns) with
    the fulfillment view (lag) and the DQ sentinel in one row per
    supplier.

    Not in the reference (SURVEY.md §2.9); business-report extension
    composing the shipping_lag_report join with the q1-style
    aggregate family.

    Shape: lineitem⋈orders on the orderkey hash (merge-pinned — both
    sides data-sized at 100 TB), ONE map-side-combined
    groupBy(suppkey), TakeOrderedAndProject for the top-k (per-
    partition heaps, no global sort), then a broadcast supplier-dim
    join and a rank window over the k-row frame (plan-lint
    whitelisted, literal-k)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        "l_returnflag",
        "l_shipdate",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            + F.lit(0.5)
        )
        .cast("long")
        .alias("net_c"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    per_supp = (
        li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        .select(
            "l_suppkey",
            "net_c",
            (F.col("l_returnflag") == "R").cast("long").alias("is_ret"),
            lag.alias("lag_d"),
        )
        .groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("net_c").alias("revenue_c"),
            F.sum("is_ret").alias("n_returned"),
            F.sum("lag_d").alias("sum_lag"),
            F.sum((F.col("lag_d") < 0).cast("long")).alias("n_neg_lag"),
        )
    )
    top = per_supp.orderBy(
        F.col("revenue_c").desc(), F.col("l_suppkey")
    ).limit(SSC_TOP_K)
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    # Rank on the limit-k frame BEFORE the dim join (mirroring the
    # oracle's top CTE): a top-k suppkey missing from supplier then
    # surfaces as a dropped rank/name, never as silently renumbered
    # ranks — parity must not depend on the FK integrity a sibling key
    # (fk_integrity_report) audits rather than guarantees.
    w = Window.orderBy(F.col("revenue_c").desc(), F.col("l_suppkey"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .join(F.broadcast(supp), "l_suppkey")
        .select(
            "rank",
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            "n_items",
            F.col("revenue_c").cast("long").alias("revenue_c"),
            F.expr(
                "CAST(CAST(n_returned AS DECIMAL(38,0)) * 1000000"
                " div n_items AS BIGINT)"
            ).alias("return_ppm"),
            F.expr("sum_lag div n_items").alias("mean_lag_days"),
            "n_neg_lag",
        )
    )


QUERIES["supplier_scorecard"] = supplier_scorecard
ORACLE["supplier_scorecard"] = f"""
    WITH per_supp AS (
      SELECT l.l_suppkey,
             COUNT(*) AS n_items,
             SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                            + 0.5) AS BIGINT)) AS revenue_c,
             SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS n_returned,
             SUM(date_diff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE))) AS sum_lag,
             SUM(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                     CAST(l.l_shipdate AS DATE)) < 0
                      THEN 1 ELSE 0 END) AS n_neg_lag
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1),
    top AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY revenue_c DESC, l_suppkey)
               AS rank
      FROM per_supp ORDER BY revenue_c DESC, l_suppkey LIMIT {SSC_TOP_K})
    SELECT CAST(t.rank AS INT) AS rank,
           t.l_suppkey AS suppkey,
           s.s_name,
           CAST(t.n_items AS BIGINT) AS n_items,
           CAST(t.revenue_c AS BIGINT) AS revenue_c,
           CAST(CAST(t.n_returned AS HUGEINT) * 1000000 // t.n_items
                AS BIGINT) AS return_ppm,
           CAST(t.sum_lag // t.n_items AS BIGINT) AS mean_lag_days,
           CAST(t.n_neg_lag AS BIGINT) AS n_neg_lag
    FROM top t JOIN supplier s ON s.s_suppkey = t.l_suppkey
"""


#: table_digest_report column recipes: every hash-stable column of each
#: table, normalized to strings — integers/strings as-is, money through
#: the shared cents quantization, fractions/values through e2/e6 fixed
#: point, timestamps through unix microseconds. Raw DOUBLE→string is
#: NOT engine-stable (formatting differs), so doubles only enter via
#: fixed-point; the embeddings float array is excluded (its integrity
#: audit is the embedding_quantize family).
_CENTS_S = "CAST(CAST(floor({c} * 100 + 0.5) AS BIGINT) AS STRING)"
_E6_S = "CAST(CAST(floor({c} * 1000000 + 0.5) AS BIGINT) AS STRING)"
_US_S = "CAST(unix_micros({c}) AS STRING)"
TD_COLUMNS: dict[str, list[str]] = {
    "region": ["CAST(r_regionkey AS STRING)", "r_name"],
    "nation": [
        "CAST(n_nationkey AS STRING)",
        "n_name",
        "CAST(n_regionkey AS STRING)",
    ],
    "customer": [
        "CAST(c_custkey AS STRING)",
        "c_name",
        "CAST(c_nationkey AS STRING)",
        _CENTS_S.format(c="c_acctbal"),
        "c_mktsegment",
    ],
    "supplier": [
        "CAST(s_suppkey AS STRING)",
        "s_name",
        "CAST(s_nationkey AS STRING)",
        _CENTS_S.format(c="s_acctbal"),
    ],
    "part": [
        "CAST(p_partkey AS STRING)",
        "p_name",
        "p_brand",
        "p_type",
        "CAST(p_size AS STRING)",
        _CENTS_S.format(c="p_retailprice"),
    ],
    "orders": [
        "CAST(o_orderkey AS STRING)",
        "CAST(o_custkey AS STRING)",
        "o_orderstatus",
        _CENTS_S.format(c="o_totalprice"),
        _US_S.format(c="o_orderdate"),
        "o_orderpriority",
    ],
    "lineitem": [
        "CAST(l_orderkey AS STRING)",
        "CAST(l_partkey AS STRING)",
        "CAST(l_suppkey AS STRING)",
        "CAST(l_linenumber AS STRING)",
        _CENTS_S.format(c="l_quantity"),
        _CENTS_S.format(c="l_extendedprice"),
        _CENTS_S.format(c="l_discount"),
        _CENTS_S.format(c="l_tax"),
        "l_returnflag",
        "l_linestatus",
        _US_S.format(c="l_shipdate"),
    ],
    "events": [
        "CAST(event_id AS STRING)",
        _US_S.format(c="ts"),
        "CAST(user_id AS STRING)",
        "event_type",
        _E6_S.format(c="value"),
        "props",
    ],
    "documents": [
        "CAST(doc_id AS STRING)",
        "text",
        "lang",
        "source",
        "CAST(n_chars AS STRING)",
    ],
    "embeddings": ["CAST(vec_id AS STRING)", "CAST(label AS STRING)"],
}
#: Digest modulus: the Mersenne prime 2^61 − 1 — the summed 52-bit row
#: hashes stay inside HUGEINT/DECIMAL(38,0) at any corpus size and the
#: reduced digest inside BIGINT.
TD_MOD = 2305843009213693951


def td_row_hash(table: str):
    """The 52-bit canonical row hash for `table` (TD_COLUMNS recipe) —
    shared by the batch digest and the streaming digest monitor so the
    two can never disagree on row canonicalization."""
    return F.expr(
        "conv(substring(md5(concat_ws(chr(31), "
        + ", ".join(TD_COLUMNS[table])
        + ")), 1, 13), 16, 10)"
    ).cast("long")


def table_digest_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable snapshot digest per table: each row
    canonicalizes to a chr(31)-joined string of its hash-stable
    columns, md5's to a 52-bit integer, and the per-table digest is
    the SUM of row hashes mod 2^61−1 — ADDITIVE, so it is
    order-independent, partition-independent, and MERGEABLE (shard
    digests sum to the table digest; the register-merge property the
    HLL/CMS/quantile sketches in this repo share). Two replicas (or a
    snapshot before/after a migration) compare with 10 BIGINTs
    instead of a row diff — the cheap integrity check a lake runs
    after every copy/compaction/backfill, complementing
    cross_snapshot_dedup (which finds WHICH rows differ, at row-diff
    cost).

    Not in the reference (SURVEY.md §2.9); data-versioning extension.

    Exactness: doubles enter only through the shared fixed-point
    quantizations and timestamps through unix micros (raw
    double→string formatting is not engine-stable); concat_ws skips
    NULLs identically in both engines (corpus-null-free; planted-null
    divergence is the schema_drift/analyze family's job).

    Shape: one full scan per table (inherent to a digest) reducing to
    a single map-side-combined DECIMAL sum — no shuffle beyond the
    1-row aggregates; the 10-row union is driver-trivial."""
    parts = []
    for t in TD_COLUMNS:
        df = load_table(spark, sf_dir, t)
        row_h = td_row_hash(t)
        parts.append(
            df.select(row_h.alias("h")).agg(
                F.count("*").alias("n_rows"),
                F.expr(
                    f"CAST(SUM(CAST(h AS DECIMAL(38,0))) % {TD_MOD} AS BIGINT)"
                ).alias("digest"),
            ).select(F.lit(t).alias("table_name"), "n_rows", "digest")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


QUERIES["table_digest_report"] = table_digest_report


def td_row_hash_sql(table: str) -> str:
    """DuckDB twin of td_row_hash: the 52-bit canonical row-hash
    EXPRESSION for `table` — shared by the digest-report oracle and the
    pipeline_lake oracle so the two can never disagree on row
    canonicalization (the same single-source rule td_row_hash enforces
    on the Spark side)."""
    dcols = ", ".join(
        c.replace(" AS STRING)", " AS VARCHAR)")
        .replace("unix_micros(", "epoch_us(")
        for c in TD_COLUMNS[table]
    )
    return (
        f"('0x' || substr(md5(concat_ws(chr(31), {dcols})), 1, 13))::BIGINT"
    )


def _table_digest_oracle() -> str:
    selects = []
    for t in TD_COLUMNS:
        selects.append(
            f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows,"
            f" CAST(SUM(CAST({td_row_hash_sql(t)} AS HUGEINT))"
            f" % {TD_MOD} AS BIGINT) AS digest"
            f" FROM {t}"
        )
    return " UNION ALL ".join(selects)


ORACLE["table_digest_report"] = _table_digest_oracle()


def trade_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full supplier-nation × customer-nation trade matrix:
    exact revenue cents and item counts for every nation pair with
    any trade — TPC-H q7 generalized from two hand-picked nations to
    the complete ≤625-row flow matrix plus each pair's share (ppm) of
    total trade. The market-structure view a logistics/BI team reads
    whole, instead of re-running q7 per pair.

    Extends the reference surface (SURVEY.md §2.9 — the reference has
    one broadcast dim join and no multi-join analytics); TPC-H-family
    extension composing the q5/q7 join graph.

    Shape: lineitem⋈orders on the orderkey hash (both sides
    data-sized — merge-pinned), then customer and supplier resolve
    via key joins with their ≤25-row nation dims BROADCAST onto them;
    the final rollup is the bounded nation×nation grid and the share
    rides a broadcast 1-row total. ppm through DECIMAL(38,0)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            + F.lit(0.5)
        )
        .cast("long")
        .alias("net_c"),
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_nationkey").alias("cust_nk")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), F.col("s_nationkey").alias("supp_nk")
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    flows = (
        li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        .join(cust, "o_custkey")
        .join(supp, "l_suppkey")
        .groupBy("supp_nk", "cust_nk")
        .agg(F.count("*").alias("n_items"), F.sum("net_c").alias("revenue_c"))
    )
    tot = flows.agg(F.sum("revenue_c").alias("total_c"))
    return (
        flows.join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("supp_nk"),
                                   F.col("n_name").alias("supp_nation"))),
            "supp_nk",
        )
        .join(
            F.broadcast(nat.select(F.col("n_nationkey").alias("cust_nk"),
                                   F.col("n_name").alias("cust_nation"))),
            "cust_nk",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "supp_nation",
            "cust_nation",
            "n_items",
            F.col("revenue_c").cast("long").alias("revenue_c"),
            F.expr(
                "CAST(CAST(revenue_c AS DECIMAL(38,0)) * 1000000"
                " div CAST(total_c AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


QUERIES["trade_flow_matrix"] = trade_flow_matrix
ORACLE["trade_flow_matrix"] = """
    WITH flows AS (
      SELECT s.s_nationkey AS supp_nk, c.c_nationkey AS cust_nk,
             COUNT(*) AS n_items,
             SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                            + 0.5) AS BIGINT)) AS revenue_c
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2),
    tot AS (SELECT SUM(revenue_c) AS total_c FROM flows)
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(f.n_items AS BIGINT) AS n_items,
           CAST(f.revenue_c AS BIGINT) AS revenue_c,
           CAST(CAST(f.revenue_c AS HUGEINT) * 1000000 // t.total_c
                AS BIGINT) AS share_ppm
    FROM flows f
    JOIN nation ns ON ns.n_nationkey = f.supp_nk
    JOIN nation nc ON nc.n_nationkey = f.cust_nk
    CROSS JOIN tot t
"""

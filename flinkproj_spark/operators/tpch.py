"""Extended TPC-H-adapted query family (corpus-schema variants).

Widens the relational surface beyond relational.py's Q1/Q3/Q5/Q6 with
the join/subquery shapes the TPC-H suite exercises: semi joins (Q4),
nation-pair theta self-joins (Q7), outer-join distributions (Q13),
conditional-aggregate ratios (Q14), HAVING semi-joins (Q18),
OR-of-ANDs multi-predicate scans (Q19), and anti-join + scalar
subquery (Q22). The corpus schema is a simplified TPC-H (no partsupp,
no comment/date columns — TESTDATA.md), so predicates are adapted;
the *plan shapes* are the point.

Scale notes (same discipline as relational.py):
  * money math in exact integer cents — order-independent partial
    aggregation at any parallelism;
  * dimension sides broadcast; filters precede joins so they reach the
    parquet scan;
  * semi/anti joins declared as such (left_semi / left_anti) so no
    payload columns shuffle;
  * every top-k has a unique-key tiebreak — deterministic under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkproj_spark.sources.tables import load_table

from flinkproj_spark.operators.relational import _cents

_REV_E4_SQL = ("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) * "
               "(100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))")


def _rev_e4():
    return _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (order-priority checking, adapted): orders placed in 1996 with
    at least one returned lineitem, counted per priority. The EXISTS is
    a left-semi join — only o_orderkey shuffles from the probe side."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    # fact-fact semi join: pinned to shuffle (the R-filtered lineitem
    # key column is corpus-proportional; broadcast would cap scale)
    hit = orders.join(
        returned.hint("merge"), orders.o_orderkey == returned.l_orderkey, "left_semi"
    )
    return hit.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 (volume shipping, adapted): revenue flowing between the nation
    pair (NATION_1, NATION_2) in either direction, per ship year. Both
    nation maps broadcast onto the fact before the pair filter."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    agg = joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.sum(_rev_e4()).alias("_rev_e4"))
    return agg.select(
        "supp_nation",
        "cust_nation",
        "l_year",
        (F.col("_rev_e4").cast("double") / F.lit(10000.0)).alias("revenue"),
    )


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 (returned-item reporting): top-20 customers by revenue lost to
    returns in 1996H1. Fact-fact join shuffles; customer/nation broadcast;
    top-k rank has the c_custkey tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(_rev_e4()).alias("_rev_e4")
    )
    top = agg.orderBy(F.col("_rev_e4").desc(), F.col("c_custkey")).limit(20)
    return top.select(
        "c_custkey",
        "c_name",
        "n_name",
        (F.col("_rev_e4").cast("double") / F.lit(10000.0)).alias("revenue"),
    )


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 (customer order distribution): LEFT OUTER join so zero-order
    customers survive with c_count=0, then the distribution-of-counts
    second aggregation. Two shuffles, both on narrow keys."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        # orders is a fact: pinned to shuffle on the (narrow) join key
        cust.join(orders.hint("merge"), cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 (promotion effect): PROMO revenue share of one ship-month as a
    conditional-aggregate ratio. part broadcast; exact-cent sums; the
    only double op is the final ratio."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    agg = joined.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", _rev_e4()).otherwise(F.lit(0))
        ).alias("_promo_e4"),
        F.sum(_rev_e4()).alias("_total_e4"),
    )
    return agg.select(
        F.round(
            F.lit(100.0) * F.col("_promo_e4").cast("double")
            / F.col("_total_e4").cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 (large-volume customers): orders whose total quantity exceeds
    300 (HAVING over a pre-aggregation), semi-joined back to orders +
    customer. The pre-agg shrinks the fact before any join."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).alias("_qty_c"))
        .filter(F.col("_qty_c") > 300 * 100)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # orders ⋈ (lineitem pre-agg) is fact-fact: pinned to shuffle — the
    # HAVING-filtered aggregate still scales with the fact
    joined = orders.join(big.hint("merge"), orders.o_orderkey == big.l_orderkey).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    return joined.select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        (F.col("_qty_c").cast("double") / F.lit(100.0)).alias("total_qty"),
    )


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 (discounted revenue): OR-of-ANDs predicate over part attrs ×
    lineitem quantity bands — the disjunctive-pushdown shape. part is
    broadcast; the disjunction runs codegen'd post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25)) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35)) & q.between(20, 30))
    )
    agg = j.filter(cond).agg(
        F.sum(_rev_e4()).alias("_rev_e4"), F.count("*").alias("n_items")
    )
    return agg.select(
        (F.col("_rev_e4").cast("double") / F.lit(10000.0)).alias("revenue"), "n_items"
    )


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 (global sales opportunity): customers with above-average
    positive balance and NO recent (2000+) orders — scalar subquery
    (broadcast 1-row cross join) + left-anti join, grouped by a
    synthetic country code."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    bal_c = _cents("c_acctbal")
    avg_row = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(bal_c).cast("double") / F.count("*")).alias("_avg_c"))
    )
    rich = cust.join(F.broadcast(avg_row)).filter(
        bal_c.cast("double") > F.col("_avg_c")
    )
    # anti join against the recent-orders keys: fact-derived, pinned to
    # shuffle (broadcasting orders' key column caps scale)
    no_orders = rich.join(
        orders.hint("merge"), rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return (
        no_orders.groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(bal_c).cast("double") / F.lit(100.0)).alias("totacctbal"),
        )
    )


QUERIES = {
    "tpch_q4": tpch_q4,
    "tpch_q7": tpch_q7,
    "tpch_q10": tpch_q10,
    "tpch_q13": tpch_q13,
    "tpch_q14": tpch_q14,
    "tpch_q18": tpch_q18,
    "tpch_q19": tpch_q19,
    "tpch_q22": tpch_q22,
}

ORACLE = {
    "tpch_q4": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY 1
    """,
    "tpch_q7": f"""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
               CAST(SUM({_REV_E4_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) / 10000.0 AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
    "tpch_q10": f"""
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(SUM({_REV_E4_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) / 10000.0 AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY 1, 2, 3
        ORDER BY SUM({_REV_E4_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) DESC, c.c_custkey
        LIMIT 20
    """,
    "tpch_q13": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
              FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
              GROUP BY 1)
        GROUP BY 1
    """,
    "tpch_q14": f"""
        SELECT ROUND(100.0 *
               CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_E4_SQL} ELSE 0 END) AS DOUBLE) /
               CAST(SUM({_REV_E4_SQL}) AS DOUBLE), 6) AS promo_revenue_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
          AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
    "tpch_q18": """
        WITH big AS (
          SELECT l_orderkey,
                 SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS qty_c
          FROM lineitem GROUP BY 1
          HAVING SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) > 30000)
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
               CAST(b.qty_c AS DOUBLE) / 100.0 AS total_qty
        FROM orders o
        JOIN big b ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "tpch_q19": f"""
        SELECT CAST(SUM({_REV_E4_SQL}) AS DOUBLE) / 10000.0 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q22": """
        WITH avg_bal AS (
          SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                   / COUNT(*) AS avg_c
          FROM customer WHERE c_acctbal > 0)
        SELECT CAST(c.c_nationkey % 5 AS BIGINT) AS cntrycode,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS totacctbal
        FROM customer c, avg_bal
        WHERE CAST(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS DOUBLE) > avg_bal.avg_c
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY 1
    """,
}

"""Physical-plan shape assertions — the 100 TB survival checks.

Each test pins a property the scale mandate requires: broadcast joins
stay broadcast, filters reach the parquet scan, projections prune
columns, hot paths stay in whole-stage codegen."""

from __future__ import annotations

from flinkproj_spark.operators.clean import dim_join
from flinkproj_spark.operators.relational import tpch_q3, tpch_q6
from flinkproj_spark.operators.similarity import ann_topk_brute
from flinkproj_spark.operators.text import text_token_count


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.org.apache.spark.sql.execution.ExplainUtils.processPlan(
        df._jdf.queryExecution().executedPlan(),
        df._sc._jvm.java.lang.StringBuilder(),
    ) if False else df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_dim_join_is_broadcast(spark, sf_dir):
    plan = _plan(dim_join(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the fact side must never shuffle


def test_tpch_q6_filters_pushed_to_scan(spark, sf_dir):
    plan = _formatted(tpch_q6(spark, sf_dir))
    assert "PushedFilters:" in plan
    # shipdate range + quantity/discount bounds reach the parquet reader
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0]


def test_tpch_q6_prunes_columns(spark, sf_dir):
    plan = _formatted(tpch_q6(spark, sf_dir))
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    # 11-column table, only the 4 referenced columns scanned
    assert "l_returnflag" not in read_schema
    assert "l_extendedprice" in read_schema


def test_tpch_q3_broadcasts_customer_not_facts(spark, sf_dir):
    # customer (bounded dim) broadcasts; orders⋈lineitem is fact-fact
    # and must stay a shuffle join — at sf0.1 the pruned lineitem slips
    # under the broadcast threshold and an unhinted plan broadcasts a
    # FACT table (driver/executor OOM at scale).
    plan = _plan(tpch_q3(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" in plan
    for line in plan.splitlines():
        if "BroadcastExchange" in line or "BroadcastHashJoin" in line:
            assert "l_orderkey" not in line and "l_extendedprice" not in line


def test_tpch_q12_fact_join_is_shuffle(spark, sf_dir):
    from flinkproj_spark.operators.tpch2 import tpch_q12

    plan = _plan(tpch_q12(spark, sf_dir))
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_ann_brute_broadcasts_queries(spark, sf_dir):
    plan = _plan(ann_topk_brute(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_text_ops_stay_jvm_side_and_shuffle_free(spark, sf_dir):
    # Higher-order array lambdas run interpreted-JVM (outside whole-stage
    # codegen) — the properties that matter at scale are: no Python in
    # the path, and a pure scan+project with zero exchanges.
    plan = _plan(text_token_count(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
    assert "FileScan parquet" in plan


def test_tpch_q4_uses_semi_join(spark, sf_dir):
    from flinkproj_spark.operators.tpch import tpch_q4

    plan = _plan(tpch_q4(spark, sf_dir))
    assert "LeftSemi" in plan


def test_tpch_q22_uses_anti_join_and_broadcast_scalar(spark, sf_dir):
    from flinkproj_spark.operators.tpch import tpch_q22

    plan = _plan(tpch_q22(spark, sf_dir))
    assert "LeftAnti" in plan
    # the 1-row average is broadcast, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_tpch_q14_broadcasts_part_and_pushes_shipdate(spark, sf_dir):
    from flinkproj_spark.operators.tpch import tpch_q14

    plan = _formatted(tpch_q14(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0]


def test_tpch_q18_preaggregates_before_join(spark, sf_dir):
    # The HAVING pre-agg must run on lineitem BEFORE any join touches
    # orders — at 100 TB this shrinks the fact by ~4 orders of magnitude.
    from flinkproj_spark.operators.tpch import tpch_q18

    plan = _plan(tpch_q18(spark, sf_dir))
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1


def test_tpch_q2_broadcasts_both_dims(spark, sf_dir):
    # part and supplier both broadcast onto the distinct pair stream; the
    # only shuffle is the window over p_partkey.
    from flinkproj_spark.operators.tpch2 import tpch_q2

    plan = _plan(tpch_q2(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_tpch_q15_scalar_max_is_broadcast(spark, sf_dir):
    # The 1-row MAX(revenue) must reach the probe side as a broadcast,
    # never via a shuffle or a driver collect.
    from flinkproj_spark.operators.tpch2 import tpch_q15

    plan = _plan(tpch_q15(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_tpch_q16_excludes_suppliers_with_anti_join(spark, sf_dir):
    from flinkproj_spark.operators.tpch2 import tpch_q16

    plan = _plan(tpch_q16(spark, sf_dir))
    assert "LeftAnti" in plan


def test_tpch_q21_single_fact_shuffle(spark, sf_dir):
    # The EXISTS/NOT-EXISTS rewrite must not multiply fact-fact joins:
    # lineitem appears as a scan feeding one per-order aggregate, and all
    # joins against it are semi/broadcast.
    from flinkproj_spark.operators.tpch2 import tpch_q21

    plan = _plan(tpch_q21(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "SortMergeJoin LeftOuter" not in plan


def test_salted_join_shuffles_on_salted_key(spark, sf_dir):
    from flinkproj_spark.operators.relational import salted_skew_join

    plan = _plan(salted_skew_join(spark, sf_dir))
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    assert "salt" in plan  # the composite (key, salt) drives the exchange


def test_salt_actually_splits_the_hot_key(spark):
    """Runtime proof (not just key shape) on an artificially skewed
    fixture: 90 % of fact rows share one key. Hash-partitioned on the
    bare key, every hot row lands on ONE reducer; partitioned on
    (key, salt) — the exchange salted_skew_join's composite join key
    induces — the hot key's rows spread across SALT_BUCKETS tasks."""
    import pyspark.sql.functions as F

    from flinkproj_spark.operators.relational import SALT_BUCKETS

    n = 10_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("key"),
        F.col("id").alias("event_id"),
    )
    salted = fact.withColumn("salt", F.pmod("event_id", F.lit(SALT_BUCKETS)))

    def hot_key_spread(df, *cols):
        return (
            df.repartition(32, *cols)
            .withColumn("pid", F.spark_partition_id())
            .filter(F.col("key") == 1)
            .select("pid")
            .distinct()
            .count()
        )

    assert hot_key_spread(fact, "key") == 1
    # the 8 (key, salt) combos may hash-collide within 32 partitions,
    # so allow a couple of collisions — the point is 1 task -> many.
    assert hot_key_spread(salted, "key", "salt") >= SALT_BUCKETS - 2


def test_embedding_quantize_has_no_semantic_shuffle(spark, sf_dir):
    # int8 quantization is per-row vector math: no hash/range exchange
    # (no groupBy/join/sort). The only allowed Exchange is fan_out's
    # round-robin scan redistribution, which self-disables at scale.
    from flinkproj_spark.operators.curation import embedding_quantize

    plan = _plan(embedding_quantize(spark, sf_dir))
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


def test_paragraph_dedup_never_shuffles_text(spark, sf_dir):
    # Spans travel as md5s: the winner-election exchange must carry the
    # hash + ids, never the text/ws columns.
    from flinkproj_spark.operators.curation import paragraph_dedup

    plan = _plan(paragraph_dedup(spark, sf_dir))
    assert "row_number" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line and "ws" not in line


def test_cross_snapshot_dedup_is_anti_join_without_hint(spark, sf_dir):
    # Anti join against the base corpus's hash set: LeftAnti present,
    # and broadcast (if any) must come from Catalyst's size stats, not
    # a hint — the plan is built with no broadcast() call, so at real
    # scale it degrades to a shuffle join instead of OOMing the driver.
    from flinkproj_spark.operators.curation import cross_snapshot_dedup

    plan = _plan(cross_snapshot_dedup(spark, sf_dir))
    assert "LeftAnti" in plan


def test_banded_lsh_corpus_never_shuffles(spark, sf_dir):
    # The corpus side must meet broadcast probes map-side: the only
    # hash exchanges allowed are over the CANDIDATE set (query_id keys
    # for dedup + ranking), never over corpus rows or buckets.
    from flinkproj_spark.operators.similarity import ann_topk_lsh_banded

    plan = _plan(ann_topk_lsh_banded(spark, sf_dir))
    assert "BroadcastExchange" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "query_id" in line, f"corpus-side exchange: {line.strip()[:120]}"


def test_funnel_is_one_shuffle_three_windows(spark, sf_dir):
    # The chained stage columns (t1 -> t2 -> t3) must reuse the single
    # user_id partitioning: 3 Window passes, exactly 1 hash exchange.
    from flinkproj_spark.operators.analytic import funnel_steps

    plan = _plan(funnel_steps(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 3


def test_aqe_skew_join_conf_is_on(spark):
    # The zero-code skew path: AQE splits oversized shuffle partitions
    # at runtime. Pin the session factory's contract so a conf refactor
    # can't silently turn it off.
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # The write-once-shuffle-never story: bucket both join sides by the
    # join key; the join plan must contain NO Exchange at all.
    import pyspark.sql.functions as F

    from flinkproj_spark.sinks import write_bucketed
    from flinkproj_spark.sources.tables import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity")
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority")
        write_bucketed(li, "b_lineitem", "l_orderkey", 8)
        write_bucketed(orders, "b_orders", "o_orderkey", 8)
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).groupBy("o_orderpriority").agg(F.sum("l_quantity"))
        j.collect()
        plan = _plan(j)
        join_part = plan.split("HashAggregate")[-1]  # below the final agg
        assert "Exchange" not in join_part, plan
        # cross-check the join really ran as a sort-merge of bucketed scans
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    import pyspark.sql.functions as F

    from flinkproj_spark.sinks import write_partitioned
    from flinkproj_spark.sources.tables import load_table

    out = str(tmp_path / "by_type")
    events = load_table(spark, sf_dir, "events").withColumn(
        "et", F.col("event_type"))
    write_partitioned(events, out, "et")
    back = spark.read.parquet(out).filter(F.col("et") == "click")
    plan = _formatted(back)
    assert "PartitionFilters" in plan and "et" in plan.split("PartitionFilters")[1].split("\n")[0]
    assert back.count() > 0


def test_minhash_lsh_reads_documents_once(spark, sf_dir):
    # Bucket-expansion formulation: no self-join anywhere, and the
    # signature pipeline (scan → shingle explode → md5 → min-aggs →
    # banding exchange) must RUN once — the small-bucket and star-pair
    # branches share the band_key shuffle via exchange reuse, so the
    # executed plan shows a ReusedExchange on band_key instead of a
    # second full subtree.
    from flinkproj_spark.operators.dedup import dedup_minhash_lsh

    df = dedup_minhash_lsh(spark, sf_dir)
    assert "Join" not in _plan(df)
    df.collect()
    final = _plan(df)
    assert "ReusedExchange" in final and "band_key" in final.split("ReusedExchange")[1].split("\n")[0]


def test_stratified_sample_is_pure_scan_filter(spark, sf_dir):
    # Sampling must prune rows before anything downstream: no shuffle,
    # no Python, one codegen'd scan+filter+project.
    from flinkproj_spark.operators.sampling import stratified_sample

    plan = _plan(stratified_sample(spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sequence_pack_single_shuffle(spark, sf_dir):
    # One hash exchange on `source` feeds the window cumsum; the final
    # groupBy(source, pack_id) reuses that partitioning (subset key), so
    # a second exchange would mean the plan regressed.
    from flinkproj_spark.operators.sampling import sequence_pack

    plan = _plan(sequence_pack(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_sliding_window_is_inrow_expand_plus_one_shuffle(spark, sf_dir):
    # The 3-windows-per-event expansion must be an in-row explode, never
    # a self-join; one combined count shuffle.
    from flinkproj_spark.operators.sampling import sliding_window_agg

    plan = _plan(sliding_window_agg(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_upsert_keyed_converges_and_keeps_cobucket_keys(spark, tmp_path):
    """Re-fired keys converge to the latest value AND keys that share a
    hash bucket with a re-fired key survive the bucket rewrite — the
    failure mode of a naive dynamic-partition overwrite is silently
    deleting every co-bucketed key absent from the batch."""
    import pyspark.sql.functions as F

    from flinkproj_spark.sinks import UPSERT_HASH_BUCKETS, upsert_keyed

    out = str(tmp_path / "upsert")
    # find two keys that land in the SAME bucket, plus one in another
    cand = spark.createDataFrame(
        [(f"k{i}",) for i in range(64)], "doc_id string"
    ).select(
        "doc_id", (F.abs(F.hash("doc_id")) % UPSERT_HASH_BUCKETS).alias("kb")
    ).collect()
    by_bucket = {}
    for r in cand:
        by_bucket.setdefault(r.kb, []).append(r.doc_id)
    same = next(v for v in by_bucket.values() if len(v) >= 2)
    other = next(
        v[0] for b, v in by_bucket.items()
        if v[0] not in same
    )
    a, b = same[0], same[1]

    v1 = spark.createDataFrame([(a, 1), (b, 1), (other, 1)], "doc_id string, count int")
    v2 = spark.createDataFrame([(a, 2)], "doc_id string, count int")
    upsert_keyed(v1, out)
    upsert_keyed(v2, out)
    rows = {r.doc_id: r["count"] for r in spark.read.parquet(out).collect()}
    assert rows[a] == 2        # re-fired key converged to the latest value
    assert rows[b] == 1        # co-bucketed key survived the rewrite
    assert rows[other] == 1    # untouched bucket untouched
    assert len(rows) == 3


def test_global_topk_is_heap_not_full_sort(spark, sf_dir):
    from flinkproj_spark.operators.relational import global_topk

    plan = _plan(global_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    # a global Sort node would mean the whole table funnels through a
    # total-order shuffle — fatal at scale
    assert "Sort " not in plan, plan


def test_bm25_topk_is_heap_with_broadcast_corpus_constants(spark, sf_dir):
    from flinkproj_spark.operators.retrieval import bm25_topk

    plan = _plan(bm25_topk(spark, sf_dir))
    # top-k must be a per-partition heap + driver merge, never a global sort
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan
    # corpus constants (N, df, avgdl) arrive as a broadcast one-row join
    assert "BroadcastNestedLoopJoin" in plan


def test_tpch_q2_semi_join_below_distinct(spark, sf_dir):
    from flinkproj_spark.operators.tpch2 import tpch_q2

    plan = _plan(tpch_q2(spark, sf_dir))
    # the part filter must narrow the fact BEFORE the pair-distinct's
    # exchange: LeftSemi appears below (= later in the tree than) the
    # distinct's HashAggregate shuffle
    semi = plan.index("LeftSemi")
    dist_exchange = plan.index("Exchange hashpartitioning(l_partkey")
    assert semi > dist_exchange, "semi join must run scan-side of the distinct"


def test_pipeline_curate_anti_join_is_broadcast(spark, sf_dir):
    from flinkproj_spark.operators.e2e import pipeline_curate

    plan = _plan(pipeline_curate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the filter funnel fuses into the scan: no Python anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sample_exact_k_single_shuffle_on_group_key(spark, sf_dir):
    from flinkproj_spark.operators.retrieval import sample_exact_k

    plan = _plan(sample_exact_k(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1


def test_ivf_cells_as_partition_column_prune_probes(spark, sf_dir, tmp_path):
    # The IVF docstring's 100 TB claim, pinned: materialize the cell
    # assignment as a partition column (the library's index-build +
    # writer pair), then a probe of N_PROBE cells must be a
    # partition-pruned scan (only the probed directories read).
    import pyspark.sql.functions as F

    from flinkproj_spark.operators.similarity import ivf_assignments
    from flinkproj_spark.sources.files import write_ivf_index

    out = str(tmp_path / "ivf_index")
    write_ivf_index(ivf_assignments(spark, sf_dir), out)

    probed = spark.read.parquet(out).filter(F.col("cell").isin(8, 9, 10, 11))
    plan = _formatted(probed)
    pf = plan.split("PartitionFilters")[1].split("\n")[0]
    assert "cell" in pf, plan
    # pruned scan reads only the probed cells
    assert probed.select("cell").distinct().count() <= 4


def test_time_rollup_is_single_expand_single_shuffle(spark, sf_dir):
    from flinkproj_spark.operators.analytic import time_rollup_multires

    plan = _plan(time_rollup_multires(spark, sf_dir))
    assert plan.count("Expand") == 1  # one pass for all three resolutions
    assert plan.count("Exchange") == 1
    assert plan.count("Scan parquet") == 1


def test_domain_mix_never_shuffles_corpus_rows(spark, sf_dir):
    # pass 1 aggregates the tiny lang-count table; the kept-rows side is
    # a scan + broadcast join + filter — no Exchange above the doc scan
    from flinkproj_spark.operators.sampling import domain_mix

    plan = _plan(domain_mix(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    docs_branch = plan.split("BroadcastHashJoin")[1].split("BroadcastExchange")[0]
    assert "Exchange" not in docs_branch, plan


def test_train_shard_shuffle_is_one_exchange_plus_local_sort(spark, sf_dir):
    from flinkproj_spark.operators.sampling import train_shard_shuffle

    plan = _plan(train_shard_shuffle(spark, sf_dir))
    assert plan.count("Exchange") == 1  # hash partition on shard only
    # Sort [...], false, 0 == in-partition sort; true would be a total sort
    assert "Sort [" in plan and "], false, 0" in plan
    assert "], true, 0" not in plan


def test_ngram_jaccard_is_bucket_expand_not_self_join(spark, sf_dir):
    # The blocking stage must be the capped bucket-expand shape (one
    # scan, one shuffle on bkey, in-row pair expansion) — a bkey
    # self-join would show two document scans and an unbounded O(k²)
    # merge-join key on any boilerplate-hot prefix.
    from flinkproj_spark.operators.dedup import dedup_ngram_jaccard

    plan = _plan(dedup_ngram_jaccard(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("FileScan parquet") == 1


def test_ngram_jaccard_hot_bucket_is_dropped(spark, tmp_path):
    # Runtime proof of the BUCKET_CAP guard: a prefix shared by
    # CAP+50 near-identical docs would expand to ~31k pairs un-capped;
    # the capped plan drops that block and keeps the healthy one.
    import pyspark.sql.functions as F

    from flinkproj_spark.operators.dedup import BUCKET_CAP, dedup_ngram_jaccard

    hot = spark.range(BUCKET_CAP + 50).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.concat(
            F.lit("boiler plate prefix words repeated everywhere num "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    ok = spark.range(1000, 1003).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("rare unique opening sentence tail "), F.col("id").cast("string")).alias("text"),
    )
    hot.unionByName(ok).write.parquet(str(tmp_path / "documents.parquet"))
    pairs = dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    assert len(pairs) == 3  # C(3,2)=3 from the healthy block only
    assert all(r.doc_a >= 1000 for r in pairs)


def test_lsh_hot_bucket_emits_star_pairs_and_matches_oracle(spark, tmp_path):
    """The BUCKET_CAP fallback, exercised: BUCKET_CAP+50 identical docs
    collide in every band (k = 250 > 200), so the bucket must emit O(k)
    STAR pairs (min doc_id × each member), not C(250,2) ≈ 31k clique
    pairs and not zero. A healthy 3-doc near-dup group keeps its full
    expansion, and the DuckDB oracle — same star semantics — must
    hash-match on this fixture, proving the cap path is cross-engine
    deterministic, not just plausible."""
    import duckdb
    import pyspark.sql.functions as F

    from flinkproj_spark.operators.dedup import (
        BUCKET_CAP,
        _MINHASH_PAIRS_SQL,
        dedup_minhash_lsh,
    )

    k = BUCKET_CAP + 50
    hot = spark.range(k).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.lit("exactly the same boilerplate sentence repeated in every document""").alias("text"),
    )
    ok = spark.range(1000, 1003).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.concat(
            F.lit("a genuinely rare shared opening phrase with unique tail "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    hot.unionByName(ok).select(
        "doc_id", "text", "lang", "source",
        F.length("text").alias("n_chars"),
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    got = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, str(tmp_path)).collect()}
    star = {(0, d) for d in range(1, k)}
    assert star <= got, "hot bucket must pair every member with the min doc_id"
    assert {(1000, 1001), (1000, 1002), (1001, 1002)} <= got  # healthy clique intact
    assert len(got) == (k - 1) + 3  # linear, not quadratic

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    oracle = {(a, b) for a, b in con.execute(_MINHASH_PAIRS_SQL).fetchall()}
    assert oracle == got


def test_dedup_cluster_checkpoints_reliably(spark, sf_dir, tmp_path):
    # Fault-tolerance pin: the iteration must cut lineage via RELIABLE
    # checkpoints in the SparkContext checkpoint dir (recoverable after
    # executor loss), not executor-local blocks.
    from flinkproj_spark.operators.dedup import dedup_cluster

    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    out = dedup_cluster(spark, sf_dir)
    assert out.count() > 0
    found = [
        f for _, _, files in __import__("os").walk(ckpt) for f in files
    ]
    assert found, "reliable checkpoint dir must contain persisted RDD blocks"


def test_text_repetition_shuffles_combined_partials_only(spark, sf_dir):
    # both aggregations must be partial+final (map-side combine), so the
    # wire carries (doc_id, gram, count) not raw grams
    from flinkproj_spark.operators.text import text_repetition

    plan = _plan(text_repetition(spark, sf_dir))
    assert plan.count("partial_count") >= 1, plan
    read = _formatted(text_repetition(spark, sf_dir)).split("ReadSchema:")[1].split("\n")[0]
    assert "text" in read and "lang" not in read  # column-pruned scan


def test_no_key_regresses_to_python_eval(spark, sf_dir):
    """Sweep EVERY registered key's physical plan: no row-at-a-time or
    Arrow expression eval anywhere (MapInPandas is fine — that's the
    declared multimodal batch path). A refactor that silently drops an
    operator into a Python UDF trips this before the bench notices."""
    from flinkproj_spark import registry
    from flinkproj_spark.plans.checks import assert_no_python_eval

    failures = {}
    for key, fn in registry.queries().items():
        try:
            assert_no_python_eval(fn(spark, sf_dir))
        except AssertionError:
            failures[key] = "python eval node in plan"
    assert not failures, failures


def test_pagerank_has_no_cartesian_and_bounded_lineage(spark, sf_dir):
    from flinkproj_spark.operators.analytic import pagerank_fixed
    from flinkproj_spark.plans.checks import executed_plan

    plan = executed_plan(pagerank_fixed(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # iterative joins stay equi-joins on the node key
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_tfidf_term_join_not_broadcast(spark, sf_dir):
    """Document frequency attaches on the corpus vocabulary — a
    Zipf-skewed, corpus-proportional key. Since r14 it is a count over
    the w-partition window on the tf frame's one w-exchange (no join at
    all); a join sneaking back in would mean the tf chain derives
    twice, and a broadcast of the vocabulary would cap scale."""
    from flinkproj_spark.operators.retrieval import tfidf_topk
    from flinkproj_spark.plans.checks import executed_plan

    plan = executed_plan(tfidf_topk(spark, sf_dir))
    # no equi-join left (the 1-row corpus-count broadcast cross join
    # remains, and is fine at any scale)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "Window" in plan


def test_cross_snapshot_bloom_prunes_before_exchange(spark, sf_dir):
    """The bloom pre-filter must prune the BASE scan BEFORE the base
    side's distinct exchange: the bitand probe joins (broadcast, on
    w_idx) sit below (= later in the tree string than) the distinct's
    hashpartitioning exchange on content_fp, and the bitmap build is a
    map-side-combined bit_or."""
    from flinkproj_spark.operators.curation import cross_snapshot_dedup

    plan = _plan(cross_snapshot_dedup(spark, sf_dir))
    probe = plan.find("& shiftleft(1")
    assert probe != -1, "bloom bitand probe missing from plan"
    dist_exchange = plan.rfind("Exchange hashpartitioning(content_fp")
    assert dist_exchange != -1 and probe > dist_exchange, (
        "bloom probe must run scan-side of the distinct's exchange"
    )
    assert "partial_bit_or" in plan  # bitmap build combines map-side
    # probe lookups are broadcast hash joins on the bitmap word index
    assert "LeftAnti" in plan  # exactness still rests on the anti join


def test_bloom_bitmap_has_no_false_negatives(spark):
    """Runtime proof of the bloom contract: every key present in the
    build side survives the probe (no false negatives — the property
    cross_snapshot_dedup's exactness rests on), and the filter does
    prune most absent keys (the pruning is real, not a no-op)."""
    import pyspark.sql.functions as F

    from flinkproj_spark.operators.curation import bloom_bitmap, bloom_maybe_contains

    keys = spark.range(500).select(F.concat(F.lit("k"), "id").alias("fp"))
    bloom = bloom_bitmap(keys, "fp")
    present = bloom_maybe_contains(keys, "fp", bloom)
    assert present.count() == 500  # nothing in the build set is dropped
    absent = spark.range(10_000, 30_000).select(
        F.concat(F.lit("k"), "id").alias("fp")
    )
    fp_rate = bloom_maybe_contains(absent, "fp", bloom).count() / 20_000
    assert fp_rate < 0.01, f"false-positive rate {fp_rate} — bloom not pruning"


def test_dedup_substring_never_shuffles_text(spark, sf_dir):
    # Grams travel as md5s + positions; no exchange may carry the text
    # or tokenized-words columns. Since r14 the gram frequency test is
    # a count over the h-partition window (one pass over the gram
    # stream) instead of a groupBy + merge join that executed the gram
    # chain twice — so the plan must carry the h-window and NO join at
    # all (a broadcast sneaking in would cap scale; a shuffle join
    # would mean the double-derivation came back).
    from flinkproj_spark.operators.dedup import dedup_substring

    plan = _plan(dedup_substring(spark, sf_dir))
    assert "Join" not in plan
    assert "Window" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line and "ws" not in line, line.strip()[:140]


def test_pq_corpus_shuffles_codes_not_vectors(spark, sf_dir):
    # After encoding, corpus-side exchanges carry (vec_id, m, code/d2)
    # narrow rows — never the 64-dim quantized vector q. The codebook,
    # distance tables, and rerank shortlist all broadcast.
    from flinkproj_spark.operators.similarity import ann_topk_pq

    plan = _plan(ann_topk_pq(spark, sf_dir))
    assert "BroadcastExchange" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert " q#" not in line and "embedding" not in line, line.strip()[:140]


def test_unigram_lm_skew_join_actually_fires(spark, tmp_path):
    """The Zipf-token-join skew claim, pinned at runtime instead of
    asserted: on a fixture where one token dominates the corpus (one
    hot reducer partition), AQE must split the token join's skewed
    partition — the executed plan shows SortMergeJoin(skew=true). This
    only works because of the operator's partitioning barrier: without
    it the vocab side reaches the join partitioning-preserved through
    the broadcast cross join and OptimizeSkewedJoin's bare-shuffle-
    stage pattern never matches (measured before the fix)."""
    import pyspark.sql.functions as F

    from flinkproj_spark.operators.curation import unigram_lm_score

    docs = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.concat(
            F.lit("zzz u"),
            F.col("id").cast("string"),
            F.lit(" t"),
            (F.col("id") * 7919).cast("string"),
        ).alias("text"),
    ).withColumn("n_chars", F.length("text"))
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    confs = {
        # local[32] partitions are far below the 256MB production
        # threshold — scale the detector down, not the fixture up
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = unigram_lm_score(spark, str(tmp_path))
        # collect() (not count()) so THIS DataFrame's QueryExecution is
        # the one that runs — count() builds a separate plan and leaves
        # df's adaptive plan unexecuted, hiding the runtime skew split
        assert len(df.collect()) == 200_000
        plan = _plan(df)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE skew join did not fire on the hot token"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_quantile_bucketize_heavy_pass_is_combined(spark, sf_dir):
    """The corpus-sized aggregation (count per distinct length) must be
    map-side combined; the only window runs over distinct lengths."""
    from flinkproj_spark.operators.sampling import quantile_bucketize
    from flinkproj_spark.plans.checks import executed_plan

    plan = executed_plan(quantile_bucketize(spark, sf_dir))
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_char_gini_text_never_shuffles(spark, sf_dir):
    # chars explode in-row; exchanges carry (doc_id, ch, partial count)
    # — never the text column
    from flinkproj_spark.operators.text import char_gini_concentration

    plan = _plan(char_gini_concentration(spark, sf_dir))
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, line.strip()[:140]


def test_cooccurrence_marginals_broadcast(spark, sf_dir):
    # the type marginals and user total must reach the pair counts as
    # broadcasts; the only hash exchanges key on user_id or the pair
    from flinkproj_spark.operators.analytic import event_cooccurrence_lift

    plan = _plan(event_cooccurrence_lift(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semdedup_pairs_is_equi_join_on_cell(spark, sf_dir):
    # SemDeDup's defining scale property: within-cell pair generation
    # is an EQUI-join on the cell id — Σ cell² cost, never corpus² —
    # and both pair sides are corpus-proportional, so the join must be
    # sort-merge (a broadcast would cap scale at executor memory).
    from flinkproj_spark.operators.similarity import semdedup_cells

    plan = _plan(semdedup_cells(spark, sf_dir))
    smj = [
        ln for ln in plan.splitlines()
        if "SortMergeJoin" in ln and "cell" in ln
    ]
    assert smj, plan


def test_bpe_apply_is_pure_map_stage(spark, sf_dir):
    # The tokenize step must scale with scan bandwidth alone: the whole
    # split → merge-replace chain → id lookup is in-row expression
    # work — no shuffle, no Python worker, nothing but scan+project.
    from flinkproj_spark.operators.text import bpe_apply

    plan = _plan(bpe_apply(spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_multimodal_pack_single_shuffle_inrow_expansion(spark, sf_dir):
    # The interleaved item stream is built and offset in-row; one hash
    # exchange on `source` feeds the window cumsum and the final
    # groupBy(source, pack_id) reuses that partitioning (subset key).
    from flinkproj_spark.operators.multimodal import multimodal_pack

    plan = _plan(multimodal_pack(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_attribution_single_window_pass(spark, sf_dir):
    # Three attribution models from ONE window operator: a single hash
    # exchange on the user key, no join, no second window sort.
    from flinkproj_spark.operators.relational import attribution_first_last

    plan = _plan(attribution_first_last(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_quality_rank_window_is_bucket_partitioned(spark, sf_dir):
    # The skew-safe two-pass rank: the doc-level row_number window must
    # partition by (lang, _qbucket) — never lang alone, which would
    # sort the dominant language in one task at 100 TB. The only
    # lang-alone windows are over the tiny (lang, bucket) aggregate.
    import re

    from flinkproj_spark.operators.text import quality_rank_per_lang

    plan = _plan(quality_rank_per_lang(spark, sf_dir))
    rn = [l for l in plan.splitlines() if "row_number()" in l]
    assert rn, plan
    assert all("_qbucket" in l for l in rn), rn
    # every Sort feeding a window that touches doc_id orders by the
    # bucket too (no full-language sort anywhere)
    doc_sorts = [
        l for l in plan.splitlines()
        if re.search(r"Sort \[lang#\d+ ASC", l) and "score_e6" in l
    ]
    assert doc_sorts and all("_qbucket" in l for l in doc_sorts), doc_sorts


def test_pareto_frontier_broadcasts_marks(spark, sf_dir):
    # The skyline must join the tiny distinct-score marks frame by
    # BROADCAST (never shuffle the scored corpus against it), and the
    # only window in the plan runs over the distinct-score aggregate —
    # no corpus-level global sort.
    from flinkproj_spark.operators.text import pareto_frontier

    plan = _plan(pareto_frontier(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_curriculum_windows_are_bounded(spark, sf_dir):
    # Two-pass rank contract: every doc-level row_number window
    # partitions by a bounded key (the score group or the (stage,
    # shard) cell) — a row_number whose Sort line names neither would
    # be a corpus-wide single-task sort at 100 TB.
    from flinkproj_spark.operators.sampling import curriculum_order

    plan = _plan(curriculum_order(spark, sf_dir))
    rn_lines = [l for l in plan.splitlines() if "row_number()" in l]
    assert rn_lines, plan
    for l in rn_lines:
        assert ("score_e6" in l) or ("shard" in l), l


def test_bpe_trainer_is_deterministic_and_complete(spark, sf_dir):
    # Trainer behavior contract: exactly K rules, bit-identical across
    # two independent runs (argmax tie-break is total), and the chain
    # property — every rule's symbols are single letters or
    # concatenations produced by EARLIER rules, never unseen symbols.
    from flinkproj_spark.operators.text import BPE_LEARN_K, bpe_learn_merges

    a = [tuple(r) for r in bpe_learn_merges(spark, sf_dir).orderBy("merge_rank").collect()]
    b = [tuple(r) for r in bpe_learn_merges(spark, sf_dir).orderBy("merge_rank").collect()]
    assert a == b and len(a) == BPE_LEARN_K
    produced = set()
    for _, lhs, rhs, _c in a:
        for sym in (lhs, rhs):
            assert len(sym) == 1 or sym in produced, (sym, a)
        produced.add(lhs + rhs)
    spark.catalog.clearCache()


def test_bloom_probe_scan_never_shuffles(spark, sf_dir):
    """The Bloom runtime filter's whole point: the probe (customer)
    scan is filtered map-side by a broadcast one-row bitmap — no
    SortMergeJoin may touch the probe path, and both probe-side joins
    (bitmap attach, verification against the build keys) broadcast."""
    from flinkproj_spark.operators.relational import bloom_semi_join

    plan = _plan(bloom_semi_join(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row bitmap attach
    assert "BroadcastHashJoin" in plan  # build-key verification join
    assert "SortMergeJoin" not in plan
    # the only exchanges: build-side distinct/bitmap assembly + the
    # final tiny groupBy(segment) — never a probe-row repartition
    assert "Exchange rangepartitioning" not in plan


def test_fk_report_aggregates_child_before_join(spark, sf_dir):
    """fk_integrity_report must reduce child rows to key cardinality
    BEFORE the parent join: every full-outer join input is an
    aggregate, so fact rows never cross the join."""
    from flinkproj_spark.operators.relational import fk_integrity_report

    plan = _plan(fk_integrity_report(spark, sf_dir))
    # one full-outer SMJ per edge, each fed by HashAggregate children
    assert plan.count("FullOuter") == 6
    assert "HashAggregate" in plan
    # no edge joins raw fact columns: the join key is always the
    # renamed aggregate key 'k'
    for line in plan.splitlines():
        if "SortMergeJoin" in line:
            assert "k#" in line


def test_vocab_sweep_windows_only_the_histogram(spark, sf_dir):
    """vocab_prune_sweep's single-task window must run over the
    count-of-counts histogram (an aggregate), never corpus or
    vocabulary rows: the Window's child is the aggregate exchange."""
    from flinkproj_spark.operators.text import vocab_prune_sweep

    plan = _plan(vocab_prune_sweep(spark, sf_dir))
    assert "Window" in plan
    # two aggregations (word counts, histogram) precede the window
    lines = plan.splitlines()
    win_at = next(i for i, ln in enumerate(lines) if "Window" in ln)
    below = "\n".join(lines[win_at:])
    assert "HashAggregate" in below  # histogram agg feeds the window


def test_edit_distance_shuffles_chunks_not_texts(spark, sf_dir):
    """dedup_edit_distance's banding join must move (doc_id, 32-char
    chunk) rows only — the text column joins back AFTER the distinct
    candidate list exists, so no exchange carries `text`."""
    from flinkproj_spark.operators.dedup import dedup_edit_distance

    plan = _plan(dedup_edit_distance(spark, sf_dir))
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line, line


def test_source_sketch_join_is_broadcast_and_narrow(spark, sf_dir):
    """source_jaccard_matrix: the 20-row sketch pair frame must join
    by broadcast (non-equi self-join of a bounded aggregate), and no
    exchange may carry the shingle text — only its 8-byte hash."""
    from flinkproj_spark.operators.dedup import source_jaccard_matrix

    plan = _plan(source_jaccard_matrix(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # sources² pair frame
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "sh#" not in line and "text#" not in line, line


def test_split_leakage_adds_no_join_for_splits(spark, sf_dir):
    """split_leakage_report computes both endpoints' splits in-row
    (pure hash of doc_id): the plan may contain only the two pair
    generators' joins — LSH bucket self-join and the fingerprint
    self-join — and no join against a split-assignment table."""
    from flinkproj_spark.operators.dedup import split_leakage_report

    plan = _plan(split_leakage_report(spark, sf_dir))
    # every join key is a band key or the content fingerprint; the
    # split columns exist only inside projections
    for line in plan.splitlines():
        if "SortMergeJoin" in line or "ShuffledHashJoin" in line:
            # pair generators join on band key / fingerprint; the only
            # other join is the ≤6-row matrix full-outer merge
            assert (
                "band" in line or "h#" in line or "FullOuter" in line
            ), line
    assert "text#" not in "\n".join(
        ln for ln in plan.splitlines() if "Exchange" in ln
    )


def test_cep_fold_is_single_exchange_no_python(spark, sf_dir):
    """The CEP matcher must be ONE exchange on user_id with the state
    machine as a codegen'd aggregate fold — no Python evaluator, no
    second shuffle, no window sort."""
    from flinkproj_spark.operators.analytic import cep_pattern_matches

    plan = _plan(cep_pattern_matches(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan


def test_shipping_lag_windows_only_the_histogram(spark, sf_dir):
    """shipping_lag_report's percentile windows must run over the
    (priority, lag) histogram aggregate, never fact rows: the join is
    the only fact-fact stage, and a HashAggregate sits between it and
    the Window."""
    from flinkproj_spark.operators.relational import shipping_lag_report

    plan = _plan(shipping_lag_report(spark, sf_dir))
    assert "SortMergeJoin" in plan  # pinned fact-fact join
    lines = plan.splitlines()
    win_at = next(i for i, ln in enumerate(lines) if "Window" in ln)
    join_at = next(i for i, ln in enumerate(lines) if "SortMergeJoin" in ln)
    agg_between = any(
        "HashAggregate" in ln for ln in lines[win_at:join_at]
    )
    assert win_at < join_at and agg_between


def test_ewma_window_runs_over_daily_aggregate(spark, sf_dir):
    """ewma_daily_anomaly's lag window must run over the per-day
    aggregate (HashAggregate below the Window), be partitioned by
    event_type (never a global sort), and stay JVM-side."""
    from flinkproj_spark.operators.analytic import ewma_daily_anomaly

    plan = _plan(ewma_daily_anomaly(spark, sf_dir))
    lines = plan.splitlines()
    win_at = next(i for i, ln in enumerate(lines) if "Window" in ln)
    assert "event_type" in lines[win_at]  # partitioned window
    assert any("HashAggregate" in ln for ln in lines[win_at:])
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_k_anonymity_broadcasts_the_k_list(spark, sf_dir):
    """k_anonymity_report must broadcast the 4-row k frame against the
    QID-class aggregate — one scan of customer, no shuffle join, no
    sort anywhere."""
    from flinkproj_spark.operators.analytic import k_anonymity_report

    plan = _plan(k_anonymity_report(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("customer.parquet") == 1  # one scan of the fact table
    assert "SortMergeJoin" not in plan


def test_vocab_growth_window_runs_over_checkpoint_frame(spark, sf_dir):
    """vocab_growth_curve's cumulative window must consume the
    checkpoint aggregates (HashAggregate below the Window) and never
    Python; term frames reach the join pre-aggregated."""
    from flinkproj_spark.operators.text import vocab_growth_curve

    plan = _plan(vocab_growth_curve(spark, sf_dir))
    lines = plan.splitlines()
    win_at = next(i for i, ln in enumerate(lines) if "Window" in ln)
    assert any("HashAggregate" in ln for ln in lines[win_at:])
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_conversion_lag_joins_once_windows_histogram(spark, sf_dir):
    """conversion_lag_curve: exactly one user-keyed fact join; the
    cumulative window consumes the day-offset histogram (aggregate
    below it), and the cohort scalar arrives broadcast."""
    from flinkproj_spark.operators.analytic import conversion_lag_curve

    plan = _plan(conversion_lag_curve(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row cohort scalar
    lines = plan.splitlines()
    win_at = next(i for i, ln in enumerate(lines) if "Window" in ln)
    assert any("HashAggregate" in ln for ln in lines[win_at:])
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_matryoshka_corpus_never_shuffles(spark, sf_dir):
    """All three rankings must broadcast the query vectors — the only
    exchanges are the per-query top-k windows and the tiny overlap
    joins; the embeddings scan itself never hash-repartitions."""
    from flinkproj_spark.operators.similarity import embedding_matryoshka_eval

    plan = _plan(embedding_matryoshka_eval(spark, sf_dir))
    assert plan.count("BroadcastNestedLoopJoin") >= 3  # one per ranking
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_modularity_scalar_m_is_broadcast(spark, sf_dir):
    """graph_modularity_report: the 1-row edge-count total must reach
    the per-source frame as a broadcast, and the text column must not
    appear anywhere in the plan (only doc_id/source shuffle). The key
    materializes through fx.eager_report since round 13 (the returned
    frame is a local relation), so the INTERNAL report frame is
    captured by wrapping eager_report — the assertions pin the plan
    that actually executes."""
    from flinkproj_spark import functions as fx
    from flinkproj_spark.operators.dedup import graph_modularity_report

    captured = {}
    orig = fx.eager_report

    def capture(sp, report, caches):
        captured["report"] = report
        return orig(sp, report, caches)

    fx.eager_report = capture
    try:
        graph_modularity_report(spark, sf_dir)
    finally:
        fx.eager_report = orig
    plan = _plan(captured["report"])
    assert "BroadcastNestedLoopJoin" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line


def test_gini_rank_window_is_bucket_partitioned(spark, sf_dir):
    # Two-pass rank contract (round-8): the customer-dimension spend
    # rank must partition by the 2^24-cent bucket — the only
    # unpartitioned ordered windows left are the bucket-count offset
    # frame (money-domain-bounded) and the 10-row decile cumsum.
    from flinkproj_spark.operators.analytic import gini_revenue_lorenz

    plan = _plan(gini_revenue_lorenz(spark, sf_dir))
    rn = [l for l in plan.splitlines() if "row_number()" in l]
    assert rn, plan
    assert all("_rkb" in l for l in rn), rn
    # the unpartitioned windows touch only bucket counts / deciles,
    # never the per-customer columns
    for l in plan.splitlines():
        if "windowspecdefinition(" in l:
            head = l.split("windowspecdefinition(")[1]
            if (" ASC" in head.split(",")[0]) or (" DESC" in head.split(",")[0]):
                assert ("_bn" in l) or ("dec_m_c" in l), l


def test_rfm_ranks_are_bucket_partitioned(spark, sf_dir):
    # All three quintile ranks (recency/frequency/monetary) must run
    # within their metric's domain bucket, never as a global sort of
    # the customer dimension.
    from flinkproj_spark.operators.analytic import rfm_segmentation

    plan = _plan(rfm_segmentation(spark, sf_dir))
    rn = [l for l in plan.splitlines() if "row_number()" in l]
    assert len(rn) >= 3, plan
    assert all("_rkb" in l for l in rn), rn


def test_zipf_rank_window_is_bucket_partitioned(spark, sf_dir):
    # The vocabulary rank must partition by the log2-magnitude bucket
    # (length(bin(c)) — ≤64 buckets); no unpartitioned window may
    # touch the per-word columns.
    from flinkproj_spark.operators.text import zipf_fit_report

    plan = _plan(zipf_fit_report(spark, sf_dir))
    rn = [l for l in plan.splitlines() if "row_number()" in l]
    assert rn, plan
    assert all("_rkb" in l for l in rn), rn


def test_vocab_growth_cumsum_is_bucket_partitioned(spark, sf_dir):
    # The checkpoint-frame cumulatives must run within 4096-checkpoint
    # buckets; the only unpartitioned window is the coarse per-bucket
    # totals frame (n_docs/204800 rows).
    from flinkproj_spark.operators.text import vocab_growth_curve

    plan = _plan(vocab_growth_curve(spark, sf_dir))
    fine = [
        l for l in plan.splitlines()
        if "windowspecdefinition(_csb" in l.replace(" ", "").replace("#", "#")
        or ("windowspecdefinition(" in l and "_csb" in l.split("windowspecdefinition(")[1].split(",")[0])
    ]
    assert fine, plan
    for l in plan.splitlines():
        if "windowspecdefinition(" in l:
            head = l.split("windowspecdefinition(")[1].split(",")[0]
            if " ASC" in head or " DESC" in head:
                # coarse frame only: its aggregates are the _cs_ sums
                assert "_cs_" in l, l


def test_vocab_prune_cumsum_is_bucket_partitioned(spark, sf_dir):
    # Round-9 verdict fix: the running sums over the count-of-counts
    # histogram must run within the -length(bin(c)) magnitude bucket
    # (two-pass cumsum) — any unpartitioned ordered window may touch
    # only the bucket offset frame (_cs_*), never histogram columns,
    # and total_tokens must arrive as a 1-row broadcast, not an
    # unbounded window.
    from flinkproj_spark.operators.text import vocab_prune_sweep

    plan = _plan(vocab_prune_sweep(spark, sf_dir))
    assert "_csb" in plan, plan
    assert "unboundedfollowing" not in plan.lower(), plan
    for l in plan.splitlines():
        if "windowspecdefinition(" in l:
            head = l.split("windowspecdefinition(")[1]
            if (" ASC" in head.split(",")[0]) or (" DESC" in head.split(",")[0]):
                # unpartitioned ordered window => offset frame only
                assert "_cs_" in l or "_csb" in l, l


def test_pipeline_multimodal_gated_frame_is_persisted(spark, sf_dir):
    """The image funnel's plan shape: the gated frame (the output of
    the two Arrow stages) is PERSISTED, so every downstream consumer —
    the pair builder's rep/star/band subtrees and the final anti join
    — reads the cache and each payload decode runs ONCE regardless of
    how many subtrees reference it. Plus: an anti join for the
    near-dup drop, and no row-at-a-time Python anywhere."""
    from flinkproj_spark.operators.multimodal import pipeline_multimodal

    df = pipeline_multimodal(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("InMemoryTableScan") >= 4, plan.count("InMemoryTableScan")
    assert "LeftAnti" in plan
    assert "BatchEvalPython" not in plan
    spark.catalog.clearCache()


def test_shard_balance_single_pass_no_doc_sort(spark, sf_dir):
    """The audit's only exchanges are the map-side-combined shard agg
    (its subtree appears twice — totals re-aggregate the same 8-row
    frame; AQE reuses the exchange at runtime) — never a doc-level
    sort and never a third fact pass."""
    from flinkproj_spark.operators.sampling import shard_balance_report

    plan = _plan(shard_balance_report(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Sort " not in plan


def test_semdedup_assignment_corpus_side_never_shuffles(spark, sf_dir):
    # The two-level broadcast-codebook assignment is a pure projection
    # over the corpus scan: the r11 flat argmax shuffled N rows through
    # a groupBy(vec_id); now the only hash exchange is on `grp` inside
    # the k-row (√N) codebook build, and no exchange is keyed on
    # vec_id. Pair generation's SMJ lives in semdedup_cells, not here.
    from flinkproj_spark.operators.similarity import semdedup_assignments

    plan = _plan(semdedup_assignments(spark, sf_dir))
    assert "hashpartitioning(vec_id" not in plan, plan
    assert "SortMergeJoin" not in plan, plan

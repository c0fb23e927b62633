"""Ranked retrieval + corpus analytics for training-data pipelines.

Not in the reference (its string surface is split/concat only,
SURVEY.md §2.9) — these extend the Phase-3 text family (SURVEY.md §7)
with the search-shaped operators a data-curation pipeline runs over a
crawled corpus: BM25 ranked retrieval, per-language corpus statistics,
and exact-size deterministic per-group sampling.

Scale design:
  * bm25_topk is two shuffles end-to-end at any corpus size: one
    map-side-combined groupBy(doc_id) producing (dl, tf per query term)
    — the explode never leaves the map stage uncombined — and the final
    top-k, which Spark executes as TakeOrderedAndProject (per-partition
    heap + driver merge, no global sort). Corpus-level constants
    (N, df, avgdl) are a one-row aggregate broadcast back with a cross
    join — the scalar-subquery plan, free at any scale.
  * determinism across engines: no transcendentals. The classic BM25
    log-idf is replaced by its rational core idf = (N-df+.5)/(df+.5)
    (same ranking monotonicity for a fixed corpus); k1=1.5, b=0.75 are
    binary-exact doubles; the per-term scores are added in fixed
    expression order, so Spark and DuckDB produce bit-identical
    doubles.
  * sample_exact_k is the deterministic replacement for reservoir
    sampling: rank docs per group by md5(doc_id) and keep the first k.
    Same result on any partitioning, any retry, any engine — reservoir
    sampling is none of those. One shuffle on the group key; a skewed
    group costs one hot partition, which is why the rank key is the
    hash (uniform) and k is tiny; for huge k use per-partition heaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flinkproj_spark import functions as fx
from flinkproj_spark.sources.tables import load_table

# Fixed query-term set: frequent corpus terms (the synthetic corpus is
# query-plan vocabulary). Fixed literals keep both engines' plans and
# float-add order identical.
QUERY_TERMS = ["spark", "query", "join"]
K1 = 1.5
B = 0.75
TOP_N = 20
SAMPLE_K = 25


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 docs for a fixed conjunctive query-term set.

    Pipeline: explode lowercased words → ONE map-side-combined
    groupBy(doc_id) emitting doc length + one conditional-sum tf per
    query term (no join between tf and dl — they come out of the same
    aggregate) → one-row corpus aggregate (N, avgdl, df per term)
    broadcast back via cross join → fixed-order score expression →
    TakeOrderedAndProject top-k."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(fx.tokenize_ws()).alias("w")).select(
        "doc_id", F.lower("w").alias("w")
    )
    per_doc = tok.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum(F.when(F.col("w") == t, 1).otherwise(0)).alias(f"tf_{t}")
            for t in QUERY_TERMS
        ],
    )
    corpus = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in QUERY_TERMS
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(corpus))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl").cast("double") / avgdl)
    score = F.lit(0.0)
    for t in QUERY_TERMS:  # fixed add order = bit-identical doubles
        idf = (F.col("n_docs").cast("double") - F.col(f"df_{t}") + F.lit(0.5)) / (
            F.col(f"df_{t}").cast("double") + F.lit(0.5)
        )
        tf = F.col(f"tf_{t}").cast("double")
        score = score + idf * tf * F.lit(K1 + 1.0) / (tf + norm)
    out = scored.select("doc_id", F.round(score, 4).alias("bm25"))
    return (
        out.filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(TOP_N)
    )


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics over docs with ≥1 word: doc count,
    total/min/max words per doc, vocabulary size, average doc length.

    Two aggregation trees over one tokenized scan — per-doc lengths
    rolled up to language, and a distinct-vocab count — joined on the
    (tiny) language key via broadcast. The vocab count is the only
    expensive shuffle (distinct on (lang, word)); at 100 TB you'd swap
    it for approx_count_distinct and declare the sketch (the engine
    ships that as `approx_distinct_counts`)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("lang", "doc_id", F.explode(fx.tokenize_ws()).alias("w")).select(
        "lang", "doc_id", F.lower("w").alias("w")
    )
    per_doc = tok.groupBy("lang", "doc_id").agg(F.count("*").alias("dl"))
    by_lang = per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("n_words"),
        F.min("dl").alias("min_doc_words"),
        F.max("dl").alias("max_doc_words"),
    )
    vocab = tok.groupBy("lang").agg(F.count_distinct("w").alias("vocab"))
    return (
        by_lang.join(F.broadcast(vocab), "lang")
        .select(
            "lang",
            "n_docs",
            "n_words",
            "min_doc_words",
            "max_doc_words",
            "vocab",
            F.round(
                F.col("n_words").cast("double") / F.col("n_docs").cast("double"), 4
            ).alias("avg_doc_words"),
        )
    )


def sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group deterministic sample: rank docs within each
    language by md5(doc_id) (uniform, engine-agnostic, seedless) and
    keep the first SAMPLE_K. The deterministic twin of stratified
    reservoir sampling — identical output on any partitioning, retry,
    or engine, which `TABLESAMPLE`/`rand()` cannot promise."""
    docs = load_table(spark, sf_dir, "documents")
    rk = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(rk, "doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= SAMPLE_K)
    )


def corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset health summary — the numbers an ingest pipeline
    alerts on: doc/lang counts, total words, exact-duplicate rate
    (parts-per-1e6, integer), share of too-short docs (<20 words,
    ppm), and mean chars per doc (integer div). Single scan + one
    count-distinct on the 16-byte content hash; every ratio is integer
    arithmetic so the row hashes identically in DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    words = fx.tokenize_ws()
    staged = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(words).alias("n_words"),
        F.md5("text").alias("fp"),
    )
    agg = staged.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum("n_words").alias("total_words"),
        F.count_distinct("fp").alias("_n_distinct"),
        F.sum((F.col("n_words") < 20).cast("long")).alias("_n_short"),
        F.sum("n_chars").alias("_total_chars"),
    )
    return agg.selectExpr(
        "n_docs",
        "n_langs",
        "total_words",
        "((n_docs - _n_distinct) * 1000000) div n_docs AS dup_ppm",
        "(_n_short * 1000000) div n_docs AS short_ppm",
        "_total_chars div n_docs AS mean_chars",
    )


def tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF vector-space retrieval: cosine between the query's idf
    vector and each document's full tf·idf vector (true VSM — the doc
    norm runs over ALL the doc's terms, not just query terms), top-20.

    Exactness: idf is the rational BM25 core (N-df+0.5)/(df+0.5)
    scaled to integer e3 with integer floor division; term weights are
    BIGINTs, and both the doc-norm² and the dot product are DECIMAL
    sums of integer products (one operand cast before multiplying —
    LongType squares can wrap silently) — order-independent at any
    parallelism. The only doubles are the two final correctly-rounded
    ops: decimal→double and the divide.

    Shape (r14): tf, df, and the term weights come from ONE pass over
    the tokenized scan — df is a COUNT OVER the w-partition window on
    the tf frame, on the same w-exchange the old tf⋈idf merge join
    needed anyway. The old shape referenced the tf subtree three ways
    (the df groupBy, the join's tf side, and the query-norm's idf) and
    re-executed the scan+explode+groupBy chain for each that exchange
    reuse missed; the window leaves a single derivation. idf attaches
    with a broadcast 1-row corpus count, in-row. Zipf-skew exposure is
    unchanged — the join side already shuffled every tf row on w. The
    query-norm folds from the SAME windowed frame (per-term max of the
    constant idf over the matched rows — identical to the old idf-table
    lookup since QUERY_TERMS ∩ vocabulary is the same set either way);
    doc-norm and query-dot are both map-side-combined groupBy(doc_id);
    final top-k is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(fx.tokenize_ws()).alias("w")).select(
        "doc_id", F.lower("w").alias("w")
    )
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    words = fx.tokenize_ws()
    n_docs = docs.filter(F.size(words) >= 1).agg(F.count("*").alias("n_docs"))
    wdt = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("w")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf_e3",
            F.expr("((2 * (n_docs - df) + 1) * 1000) div (2 * df + 1)"),
        )
        .select(
            "doc_id", "w", (F.col("tf") * F.col("idf_e3")).alias("w_dt"),
            "idf_e3",
        )
    )
    # One pass computes BOTH the doc norm² and the query dot: a matched
    # query term's weight in the query vector IS its idf (query tf = 1),
    # so the dot folds into the same groupBy as a conditional sum.
    per_doc = wdt.groupBy("doc_id").agg(
        F.sum(F.col("w_dt").cast("decimal(38,0)") * F.col("w_dt")).alias("norm2"),
        F.sum(
            F.when(
                F.col("w").isin(QUERY_TERMS),
                F.col("w_dt").cast("decimal(38,0)") * F.col("idf_e3"),
            )
        ).alias("num"),
    )
    qnorm2 = (
        wdt.filter(F.col("w").isin(QUERY_TERMS))
        .groupBy("w")
        .agg(F.max("idf_e3").alias("idf_e3"))
        .agg(
            F.sum(F.col("idf_e3").cast("decimal(38,0)") * F.col("idf_e3")).alias(
                "qnorm2"
            )
        )
    )
    scored = (
        per_doc.filter(F.col("num").isNotNull())
        .crossJoin(F.broadcast(qnorm2))
        .select(
            "doc_id",
            F.round(
                F.col("num").cast("double")
                / (
                    F.sqrt(F.col("norm2").cast("double"))
                    * F.sqrt(F.col("qnorm2").cast("double"))
                ),
                6,
            ).alias("tfidf_cos"),
        )
    )
    return scored.orderBy(F.col("tfidf_cos").desc(), "doc_id").limit(TOP_N)


PRF_DOCS = 10   # pseudo-relevant feedback set: BM25 top-10
EXP_TERMS = 10  # expansion terms returned


def query_expansion_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio/RM-style):
    take the BM25 top-PRF_DOCS as assumed-relevant, score every term
    they contain by feedback-frequency × corpus rarity —
    (occurrences-in-feedback · 10⁶) div corpus-document-frequency —
    and return the top EXP_TERMS new terms (original query terms and
    stopwords excluded). The retrieval loop's second pass starts from
    these.

    Shape: the feedback ids (a 10-row frame) BROADCAST into the token
    scan to collect candidate counts; the corpus df vocabulary is the
    big side, so the candidates broadcast INTO it for the df lookup;
    the final top-k is TakeOrderedAndProject. Integer scoring — no
    float drift."""
    from flinkproj_spark.operators.text import _STOPWORDS

    fb_ids = bm25_topk(spark, sf_dir).limit(PRF_DOCS).select("doc_id")
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(fx.tokenize_ws()).alias("w")).select(
        "doc_id", F.lower("w").alias("w")
    )
    excluded = set(QUERY_TERMS) | set(_STOPWORDS)
    cands = (
        tok.join(F.broadcast(fb_ids), "doc_id")
        .filter(~F.col("w").isin(*sorted(excluded)))
        .groupBy("w")
        .agg(F.count("*").alias("n_feedback"))
    )
    df_corpus = tok.select("doc_id", "w").distinct().groupBy("w").agg(
        F.count("*").alias("df_corpus")
    )
    return (
        df_corpus.join(F.broadcast(cands), "w")
        .selectExpr(
            "w AS term",
            "n_feedback",
            "df_corpus",
            "(n_feedback * 1000000) div df_corpus AS prf_score_e6",
        )
        .orderBy(F.col("prf_score_e6").desc(), "term")
        .limit(EXP_TERMS)
    )


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


def rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the two rankers: each doc scores
    Σ 1/(RRF_K + rank) over the lists that retrieved it — the
    standard zero-tuning way to combine lexical (BM25) and
    vector-space (TF-IDF) evidence, robust to their incomparable score
    scales because only RANKS enter. Contributions are exact integers
    (1e9 div (K + rank)), so the fused ordering is bit-stable and
    oracle-hashable — no float-sum ambiguity.

    Shape: both input rankings are already TakeOrderedAndProject
    top-20 frames, so the rank windows and the full-outer merge run on
    k rows per query — at scale this is per-query driver-free work
    bounded by k·|rankers|, downstream of corpus-sized scans the
    rankers own."""
    from pyspark.sql import Window

    def ranked(df: DataFrame, score_col: str, name: str) -> DataFrame:
        w = Window.orderBy(F.col(score_col).desc(), "doc_id")
        return df.select(
            "doc_id", F.row_number().over(w).cast("long").alias(f"{name}_rank")
        )

    a = ranked(bm25_topk(spark, sf_dir), "bm25", "bm25")
    b = ranked(tfidf_topk(spark, sf_dir), "tfidf_cos", "tfidf")
    both = a.join(b, "doc_id", "full_outer")
    contrib = (
        F.coalesce(F.expr(f"1000000000 div ({RRF_K} + bm25_rank)"), F.lit(0))
        + F.coalesce(F.expr(f"1000000000 div ({RRF_K} + tfidf_rank)"), F.lit(0))
    )
    w = Window.orderBy(F.col("rrf_e9").desc(), "doc_id")
    return (
        both.select("doc_id", "bm25_rank", "tfidf_rank", contrib.alias("rrf_e9"))
        .withColumn("fused_rank", F.row_number().over(w).cast("int"))
    )


QUERIES = {
    "query_expansion_prf": query_expansion_prf,
    "rrf_fusion": rrf_fusion,
    "bm25_topk": bm25_topk,
    "corpus_stats": corpus_stats,
    "corpus_health_report": corpus_health_report,
    "sample_exact_k": sample_exact_k,
    "tfidf_topk": tfidf_topk,
}

_WORDS_SQL = "list_filter(string_split(text, ' '), w -> w != '')"
_TF_SQL = ",\n                 ".join(
    f"len(list_filter(w, x -> x = '{t}')) AS tf_{t}" for t in QUERY_TERMS
)
_DF_SQL = ",\n                 ".join(
    f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in QUERY_TERMS
)
_SCORE_SQL = " + ".join(
    f"((CAST(n_docs AS DOUBLE) - df_{t} + 0.5) / (CAST(df_{t} AS DOUBLE) + 0.5))"
    f" * CAST(tf_{t} AS DOUBLE) * {K1 + 1.0}"
    f" / (CAST(tf_{t} AS DOUBLE) + {K1} * (1.0 - {B} + {B} * CAST(dl AS DOUBLE)"
    f" / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))"
    for t in QUERY_TERMS
)

ORACLE = {
    "bm25_topk": f"""
        WITH t AS (
          SELECT doc_id,
                 list_transform({_WORDS_SQL}, x -> lower(x)) AS w
          FROM documents),
        per_doc AS (
          SELECT doc_id, len(w) AS dl,
                 {_TF_SQL}
          FROM t WHERE len(w) > 0),
        corpus AS (
          SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
                 {_DF_SQL}
          FROM per_doc)
        SELECT doc_id, bm25 FROM (
          SELECT doc_id,
                 ROUND(0.0 + {_SCORE_SQL}, 4) AS bm25
          FROM per_doc CROSS JOIN corpus)
        WHERE bm25 > 0
        ORDER BY bm25 DESC, doc_id LIMIT {TOP_N}
    """,
    "corpus_stats": f"""
        WITH tok AS (
          SELECT lang, doc_id, lower(unnest({_WORDS_SQL})) AS w
          FROM documents),
        per_doc AS (
          SELECT lang, doc_id, COUNT(*) AS dl FROM tok GROUP BY 1, 2),
        by_lang AS (
          SELECT lang, COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS n_words,
                 MIN(dl) AS min_doc_words, MAX(dl) AS max_doc_words
          FROM per_doc GROUP BY 1),
        vocab AS (
          SELECT lang, COUNT(DISTINCT w) AS vocab FROM tok GROUP BY 1)
        SELECT b.lang, n_docs, n_words, min_doc_words, max_doc_words, vocab,
               ROUND(CAST(n_words AS DOUBLE) / CAST(n_docs AS DOUBLE), 4)
                 AS avg_doc_words
        FROM by_lang b JOIN vocab v ON b.lang = v.lang
    """,
    "sample_exact_k": f"""
        SELECT doc_id, lang, rn FROM (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents)
        WHERE rn <= {SAMPLE_K}
    """,
}

ORACLE["corpus_health_report"] = f"""
    WITH s AS (
      SELECT doc_id, lang, n_chars,
             len({_WORDS_SQL}) AS n_words,
             md5(text) AS fp
      FROM documents)
    SELECT COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST((COUNT(*) - COUNT(DISTINCT fp)) * 1000000 // COUNT(*) AS BIGINT) AS dup_ppm,
           CAST(SUM(CASE WHEN n_words < 20 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS short_ppm,
           CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS mean_chars
    FROM s
"""

_QTERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)

ORACLE["tfidf_topk"] = f"""
    WITH tok AS (
      SELECT doc_id, lower(unnest({_WORDS_SQL})) AS w FROM documents),
    tf AS (
      SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (
      SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
    idf AS (
      SELECT w, ((2 * (n_docs - df) + 1) * 1000) // (2 * df + 1) AS idf_e3
      FROM dfreq CROSS JOIN n),
    wdt AS (
      SELECT t.doc_id, t.w, t.tf * i.idf_e3 AS w_dt, i.idf_e3
      FROM tf t JOIN idf i ON t.w = i.w),
    per_doc AS (
      SELECT doc_id,
             SUM(CAST(w_dt AS HUGEINT) * w_dt) AS norm2,
             SUM(CASE WHEN w IN ({_QTERMS_SQL})
                      THEN CAST(w_dt AS HUGEINT) * idf_e3 END) AS num
      FROM wdt GROUP BY 1),
    qnorm2 AS (
      SELECT SUM(CAST(idf_e3 AS HUGEINT) * idf_e3) AS qnorm2
      FROM idf WHERE w IN ({_QTERMS_SQL}))
    SELECT p.doc_id,
           ROUND(CAST(p.num AS DOUBLE)
                 / (sqrt(CAST(p.norm2 AS DOUBLE))
                    * sqrt(CAST(qn.qnorm2 AS DOUBLE))), 6) AS tfidf_cos
    FROM per_doc p CROSS JOIN qnorm2 qn
    WHERE p.num IS NOT NULL
    ORDER BY tfidf_cos DESC, p.doc_id LIMIT {TOP_N}
"""


def _prf_oracle() -> str:
    from flinkproj_spark.operators.text import _STOP_SQL

    excluded = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    return f"""
        WITH fb AS (
          SELECT doc_id FROM ({ORACLE["bm25_topk"]}) LIMIT {PRF_DOCS}),
        tok AS (
          SELECT doc_id, lower(unnest(list_filter(string_split(text, ' '),
                 w -> w != ''))) AS w
          FROM documents),
        cands AS (
          SELECT t.w, COUNT(*) AS n_feedback
          FROM tok t JOIN fb USING (doc_id)
          WHERE t.w NOT IN ({excluded}) AND t.w NOT IN ({_STOP_SQL})
          GROUP BY 1),
        dfc AS (
          SELECT w, COUNT(*) AS df_corpus
          FROM (SELECT DISTINCT doc_id, w FROM tok) GROUP BY 1)
        SELECT c.w AS term, c.n_feedback, d.df_corpus,
               (c.n_feedback * 1000000) // d.df_corpus AS prf_score_e6
        FROM cands c JOIN dfc d ON c.w = d.w
        ORDER BY prf_score_e6 DESC, term LIMIT {EXP_TERMS}
    """


ORACLE["query_expansion_prf"] = _prf_oracle()

ORACLE["rrf_fusion"] = f"""
    WITH a AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
               AS bm25_rank
      FROM ({ORACLE["bm25_topk"]})),
    b AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY tfidf_cos DESC, doc_id) AS BIGINT)
               AS tfidf_rank
      FROM ({ORACLE["tfidf_topk"]})),
    merged AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             a.bm25_rank, b.tfidf_rank,
             CAST(COALESCE(1000000000 // ({RRF_K} + a.bm25_rank), 0)
                  + COALESCE(1000000000 // ({RRF_K} + b.tfidf_rank), 0)
                  AS BIGINT) AS rrf_e9
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
    SELECT doc_id, bm25_rank, tfidf_rank, rrf_e9,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf_e9 DESC, doc_id) AS INT)
             AS fused_rank
    FROM merged
"""

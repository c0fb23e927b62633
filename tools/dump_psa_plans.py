"""Dump the plans/r13 before/after evidence for the eager-report
race-fix batch. For eager keys the returned frame is a local
relation, so the meaningful physical plan is the report/fold job as
it executes inside the call — this script rebuilds exactly that
frame (caches live, same code path) and explains it.

Usage: python tools/dump_psa_plans.py <repo_root> <suffix> [sf_dir]
  suffix: "before" (run against the old worktree) or "after".
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.abspath(sys.argv[1])
SUFFIX = sys.argv[2]
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
sys.path.insert(0, REPO)
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")


def dump(name, df):
    os.makedirs(OUT_DIR, exist_ok=True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT_DIR, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {name}_{SUFFIX}.txt")


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from flinkproj_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
        N_HASHES,
        _block_key,
        _blocked_pairs_from_keyed,
        _ngram_jaccard_pairs,
        _pair_jaccard,
        _winnow_pairs,
        _words,
        lsh_candidate_pairs,
        minhash_sigs_from_hashes,
    )
    from flinkproj_spark.operators.text import (
        _WINNOW_W,
        positional_shingle_hashes,
        winnow_fps_from_hashes,
    )
    from flinkproj_spark.session import build_session
    from flinkproj_spark.sources.tables import fan_out, load_table

    spark = build_session("dump-plans", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = fan_out(spark, SF_DIR, "documents",
                   load_table(spark, SF_DIR, "documents"))
    words = _words()
    if SUFFIX == "before":
        base = docs.select(
            "doc_id", "lang", words.alias("ws"),
            positional_shingle_hashes(words).alias("hs"),
            F.lit(1).alias("_psa"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        base.count()
        frames = {
            "minhash_lsh": lsh_candidate_pairs(minhash_sigs_from_hashes(base))
            .select("doc_a", "doc_b"),
            "ngram_jaccard": _ngram_jaccard_pairs(base)
            .select("doc_a", "doc_b"),
            "winnow": _winnow_pairs(winnow_fps_from_hashes(base))
            .select("doc_a", "doc_b"),
        }
    else:
        # mirror the r13 pre-reduced base (operators/dedup.py
        # pair_strategy_agreement)
        staged = docs.select(
            "doc_id", "lang", words.alias("ws"),
            positional_shingle_hashes(words).alias("hs"),
            F.monotonically_increasing_id().alias("_nc"),
        )
        n_ws = F.size("ws")
        n_sh = F.size("hs")
        fps = F.array_distinct(F.transform(
            F.sequence(F.lit(1), n_sh - F.lit(_WINNOW_W - 1)),
            lambda i: F.array_min(F.slice(F.col("hs"), i, _WINNOW_W)),
        ))
        base = staged.select(
            "doc_id",
            (n_ws >= 2).alias("_n2"),
            F.when(n_ws >= 2, _block_key(F.col("ws"))).alias("bkey"),
            F.when(n_ws >= 2, F.array_distinct("ws")).alias("wset"),
            *[F.when(n_sh >= 1, F.array_min(F.transform(
                "hs", lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)
              ))).alias(f"s{i}")
              for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))],
            F.when(n_sh >= _WINNOW_W, fps).alias("fps"),
            F.lit(1).alias("_psa"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        base.count()
        frames = {
            "minhash_lsh": lsh_candidate_pairs(
                base.filter(F.col("s0").isNotNull()).select(
                    "doc_id", *[f"s{i}" for i in range(N_HASHES)])
            ).select("doc_a", "doc_b"),
            "ngram_jaccard": _blocked_pairs_from_keyed(
                base.filter("_n2").select("doc_id", "bkey", "wset"),
                lambda x, y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    y["doc_id"].alias("doc_b"),
                    _pair_jaccard(x, y).alias("jaccard"),
                ),
            ).filter(F.col("jaccard") >= 0.5).select("doc_a", "doc_b"),
            "winnow": _winnow_pairs(
                base.filter(F.col("fps").isNotNull()).select(
                    "doc_id", F.explode("fps").alias("fp"))
            ).select("doc_a", "doc_b"),
        }
    names = list(frames)
    if SUFFIX == "before":
        frames = {k: v.persist(StorageLevel.MEMORY_AND_DISK)
                  for k, v in frames.items()}
        rows = []
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                shared = (
                    frames[a].join(frames[b], ["doc_a", "doc_b"], "left_semi")
                    .agg(F.count("*").alias("n_shared")))
                rows.append(
                    frames[a].agg(F.count("*").alias("n_pairs_a"))
                    .crossJoin(F.broadcast(
                        frames[b].agg(F.count("*").alias("n_pairs_b"))))
                    .crossJoin(F.broadcast(shared))
                    .select(F.lit(a).alias("strategy_a"),
                            F.lit(b).alias("strategy_b"),
                            "n_pairs_a", "n_pairs_b", "n_shared"))
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        dump("pair_strategy_agreement", out)
    else:
        tagged = None
        for i, k in enumerate(names):
            t = frames[k].select("doc_a", "doc_b", F.lit(i).alias("_s"))
            tagged = t if tagged is None else tagged.unionByName(t)
        per_pair = tagged.groupBy("doc_a", "doc_b").agg(
            *[F.sum((F.col("_s") == i).cast("long")).alias(f"c{i}")
              for i in range(len(names))])
        fold = per_pair.agg(
            *[F.coalesce(F.sum(f"c{i}"), F.lit(0)).alias(f"n{i}")
              for i in range(3)],
            *[F.coalesce(F.sum(F.col(f"c{i}") * (F.col(f"c{j}") > 0)
                               .cast("long")), F.lit(0)).alias(f"s{i}{j}")
              for i in range(3) for j in range(3) if i < j])
        dump("pair_strategy_agreement", fold)
    spark.stop()


if __name__ == "__main__":
    main()

"""Stage-split probe for pair_strategy_agreement at a tiled factor:
times (1) the shared base persist fill, (2) each strategy's pair
stage to noop off the cached base, (3) each pair frame's persist
fill, (4) the 3 comparison rows. Finds WHERE the x10/x30 blowup
lives before any rewrite (guide §1).

Usage: python tools/probe_psa.py <sf_dir>
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from flinkproj_spark.operators.dedup import (
        _ngram_jaccard_pairs,
        _winnow_pairs,
        lsh_candidate_pairs,
        minhash_sigs_from_hashes,
        _words,
    )
    from flinkproj_spark.operators.text import (
        positional_shingle_hashes,
        winnow_fps_from_hashes,
    )
    from flinkproj_spark.session import build_session
    from flinkproj_spark.sources.tables import fan_out, load_table

    spark = build_session("probe-psa", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    t = {}

    def clock(name, fn):
        t0 = time.monotonic()
        out = fn()
        t[name] = round(time.monotonic() - t0, 2)
        print(f"  {name}: {t[name]} s", flush=True)
        return out

    docs = fan_out(spark, SF_DIR, "documents",
                   load_table(spark, SF_DIR, "documents"))
    words = _words()
    base = docs.select(
        "doc_id", "lang", words.alias("ws"),
        positional_shingle_hashes(words).alias("hs"),
        F.lit(1).alias("_psa"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    clock("base_fill", lambda: base.count())

    frames = {
        "minhash_lsh": lsh_candidate_pairs(minhash_sigs_from_hashes(base))
        .select("doc_a", "doc_b"),
        "ngram_jaccard": _ngram_jaccard_pairs(base).select("doc_a", "doc_b"),
        "winnow": _winnow_pairs(winnow_fps_from_hashes(base))
        .select("doc_a", "doc_b"),
    }
    for k, v in frames.items():
        clock(f"{k}_noop_off_cache", lambda v=v: noop(v))
    persisted = {}
    for k, v in frames.items():
        p = v.persist(StorageLevel.MEMORY_AND_DISK)
        n = clock(f"{k}_persist_fill", lambda p=p: p.count())
        print(f"    {k} pairs: {n}")
        persisted[k] = p
    names = list(persisted)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            clock(f"cmp_{a}_vs_{b}", lambda a=a, b=b: (
                persisted[a].join(persisted[b], ["doc_a", "doc_b"], "left_semi")
                .agg(F.count("*")).collect()))
    print({"sf_dir": SF_DIR, "stages": t})


if __name__ == "__main__":
    main()

"""Isolated A/B bench for the ANN/embedding family (round-5 task 2).

Usage: python tools/ab_ann.py <repo_root> <label>

Runs ONLY the flagged ANN keys in a fresh JVM with the exact bench.py
measurement protocol (same warmup, noop sink, clearCache between keys,
3 passes / per-key min) and prints one JSON line. Run alternately on
r3-HEAD (.ab_r3 worktree) and r4-HEAD the same day; compare mins.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(sys.argv[1])
LABEL = sys.argv[2]
KEYS = [
    "ann_topk_brute",
    "ann_topk_lsh",
    "ann_topk_lsh_banded",
    "ann_topk_ivf",
    "ann_recall_eval",
    "embedding_neardup",
    "embedding_centroids",
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

sys.path.insert(0, REPO)

from flinkproj_spark import registry  # noqa: E402
from flinkproj_spark.session import build_session  # noqa: E402


def main() -> None:
    spark = build_session("ab-ann", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    from flinkproj_spark.sources.tables import TABLES, load_table
    for t in TABLES:
        try:
            load_table(spark, SF_DIR, t).limit(1).collect()
        except Exception:
            pass
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    qs = registry.queries()
    times: dict[str, float] = {}
    for _pass in range(3):
        for name in KEYS:
            if name not in qs:
                times[name] = -2.0
                continue
            t0 = time.perf_counter()
            try:
                qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                times[name] = min(times.get(name, float("inf")), dt)
            except Exception as e:
                times[name] = -1.0
                print(f"AB ERROR {name}: {e}", file=sys.stderr)
            finally:
                spark.catalog.clearCache()
    print(json.dumps({"label": LABEL, "repo": REPO, "queries": times}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Plan evidence for eager-report keys: the returned frame is a local
relation, so the meaningful physical plan is the report/fold job as it
executes INSIDE the call, with the caches live. This harness
monkey-patches fx.eager_report to materialize the caches exactly as the
real path does, dump the report plan, and then continue normally — so
the captured plan is the one that actually executes, for ANY eager key
in either checkout.

Usage: python tools/dump_eager_plans.py <repo_root> <suffix> key [key...]
  env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Writes plans/r14/<key>_<suffix>.txt (relative to THIS file's repo).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.abspath(sys.argv[1])
SUFFIX = sys.argv[2]
KEYS = sys.argv[3:]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sys.path.insert(0, REPO)
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def main() -> None:
    from flinkproj_spark import functions as fx
    from flinkproj_spark import registry
    from flinkproj_spark.session import build_session

    spark = build_session("dump-eager-plans", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)

    state = {"key": None}
    real = fx.eager_report

    def patched(s, report, caches):
        for c in caches:
            c.count()
        buf = io.StringIO()
        with redirect_stdout(buf):
            report.explain("formatted")
        with open(
            os.path.join(OUT_DIR, f"{state['key']}_{SUFFIX}.txt"), "w"
        ) as f:
            f.write(buf.getvalue())
        rows = report.collect()
        for c in caches:
            c.unpersist()
        return s.createDataFrame(rows, report.schema)

    fx.eager_report = patched
    # operator modules import fx as a module and call fx.eager_report at
    # run time, so the patch is seen everywhere.
    qs = registry.queries()
    for k in KEYS:
        state["key"] = k
        qs[k](spark, SF_DIR)
        spark.catalog.clearCache()
        print(f"wrote {k}_{SUFFIX}.txt")
    fx.eager_report = real


if __name__ == "__main__":
    main()

"""Per-key optimization probe: split each key's bench cost into plan
CONSTRUCTION time (fn(spark, sf_dir) — py4j plan building plus any
trainer synchronization collects) and EXECUTION time (noop sink), and
optionally dump .explain("formatted") for the committed plan evidence.

Same session/warmup/min-of-passes discipline as bench.py, so numbers
are comparable to BENCH_FULL.json entries (bench time ≈ build + exec).

Usage:
    python tools/probe_keys.py [--explain-dir DIR] key1 [key2 ...]
    # env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    #      SPARK_GRAFT_CPUS (default 32), PROBE_PASSES (default 2)

Prints one JSON line:
    {"sf_dir": ..., "keys": {k: {"build": s, "exec": s, "total": s}}}
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PASSES = int(os.environ.get("PROBE_PASSES", "2"))


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    if args and args[0] == "--explain-dir":
        explain_dir = args[1]
        args = args[2:]
    keys = args
    if not keys:
        print("usage: probe_keys.py [--explain-dir DIR] key1 [key2 ...]",
              file=sys.stderr)
        sys.exit(2)

    from flinkproj_spark import registry
    from flinkproj_spark.session import build_session

    spark = build_session("probe-keys", cpus=CPUS)
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
    out: dict[str, dict[str, float]] = {}
    for _pass in range(PASSES):
        for k in keys:
            fn = qs[k]
            spark.sparkContext.setJobDescription(f"probe:{k}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            if explain_dir and _pass == 0:
                os.makedirs(explain_dir, exist_ok=True)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(explain_dir, f"{k}.txt"), "w") as f:
                    f.write(buf.getvalue())
            spark.catalog.clearCache()
            rec = out.setdefault(
                k, {"build": float("inf"), "exec": float("inf"),
                    "total": float("inf")}
            )
            rec["build"] = round(min(rec["build"], t1 - t0), 3)
            rec["exec"] = round(min(rec["exec"], t2 - t1), 3)
            rec["total"] = round(min(rec["total"], t2 - t0), 3)
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "keys": out}))
    spark.stop()


if __name__ == "__main__":
    main()

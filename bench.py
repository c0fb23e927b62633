"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "config": {...}}

Each query is timed as a full plan execution into a no-op sink (all the
work, none of the driver collect), fresh action per query, shared
SparkSession — per BASELINE.md's measurement plan.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from flinkproj_spark import registry
    from flinkproj_spark.session import build_session

    spark = build_session("flinkproj_spark-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None

    # JVM/codegen warmup on a trivial plan so query 1 isn't charged for it.
    spark.range(1000).selectExpr("sum(id)").collect()
    # Warm the parquet reader + FS classes with a 1-row peek per table
    # (footer read only) — otherwise whichever query runs first absorbs
    # one-time class-loading that isn't part of its plan.
    from flinkproj_spark.sources.tables import TABLES, load_table
    for t in TABLES:
        try:
            load_table(spark, SF_DIR, t).limit(1).collect()
        except Exception:
            pass
    # Spawn+warm the Python/Arrow UDF workers (reused session-wide) so
    # the first pandas-UDF query isn't charged ~1 s of worker startup.
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Two full passes, per-query minimum. The first pass at each query is
    # still a cold plan (fresh Catalyst analysis + codegen); the minimum
    # rejects host-noise outliers (CPU steal / page-cache stalls measured
    # at 10-15 s on ~0.5 s queries, ~50% of runs) that would otherwise be
    # charged to whichever query they landed on. Steady-state per-query
    # wall time is the metric BASELINE.md declares.
    times: dict[str, float] = {}
    for _pass in range(2):
        for name, fn in registry.queries().items():
            t0 = time.perf_counter()
            try:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                times[name] = min(times.get(name, float("inf")), dt)
            except Exception as e:  # a failing query must not hide the rest
                times[name] = -1.0
                print(f"BENCH ERROR {name}: {e}", file=sys.stderr)
            finally:
                # operators that persist multi-consumer frames (pagerank's
                # edge frame, the MinHash signature cache) would otherwise
                # accumulate MEMORY_AND_DISK blocks across the 100+-key
                # sweep; each key pays its own materialization, none
                # inherits another's cache
                spark.catalog.clearCache()

    total = round(sum(t for t in times.values() if t >= 0), 3)
    config = {
        "spark": spark.version,
        "master": f"local[{CPUS}]",
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    full = {
        "metric": "total_wall_sec_all_queries",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "config": config,
    }
    # Full per-key record: printed for humans AND persisted next to the
    # repo so per-key history survives stdout truncation.
    print(json.dumps(full))
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_FULL.json"), "w") as f:
            json.dump(full, f, indent=1)
    except OSError as e:
        print(f"BENCH WARN could not write BENCH_FULL.json: {e}", file=sys.stderr)
    # The driver records only the LAST ~2000 chars of stdout and parses
    # the final line as JSON; the full line above is ~4-5 KB for 120+
    # keys and overflows that window. The very last line is therefore a
    # compact summary (aggregates + the slowest keys) guaranteed to fit.
    ok = sorted((t for t in times.values() if t >= 0))
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({
        "metric": "total_wall_sec_all_queries",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(times),
        "n_errors": sum(1 for t in times.values() if t < 0),
        "errors": sorted(k for k, t in times.items() if t < 0),
        "median_sec": round(ok[len(ok) // 2], 3) if ok else None,
        "p95_sec": round(ok[int(len(ok) * 0.95)], 3) if ok else None,
        "max_sec": round(ok[-1], 3) if ok else None,
        "slowest": slowest,
        "queries_full_file": "BENCH_FULL.json",
        "config": config,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

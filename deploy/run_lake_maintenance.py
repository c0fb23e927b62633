"""YARN driver main for the nightly lake-maintenance job — the batch
ops twin of the pipeline_lake query key (operators/e2e.py): PLAN the
compaction (shared day-inventory grid), EXECUTE the rewrite into a
dated output root, VERIFY the additive mod-(2^61-1) digest of the
rewritten table against the input's (abort non-zero on mismatch — a
rewrite that lost or duplicated a row must fail the job, not ship),
and print the retention (vacuum) plan for the operator on duty.

Not a reference behavior (the reference has no batch maintenance
surface, SURVEY.md §2.9); this is the production wrapper every lake
runs around the audited building blocks. All logic is the SAME shared
code the oracle keys exercise — nothing is re-derived here."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True,
                    help="input table root (events.parquet inside)")
    ap.add_argument("--out", required=True,
                    help="output root for the compacted table")
    ap.add_argument("--skip-vacuum-report", action="store_true")
    args = ap.parse_args()

    from flinkproj_spark.operators.relational import TD_MOD, td_row_hash
    from flinkproj_spark.operators.sampling import (
        compaction_plan,
        vacuum_plan,
    )
    from flinkproj_spark.sources.files import write_compacted_files
    from flinkproj_spark.sources.tables import load_table

    spark = SparkSession.builder.appName("LakeMaintenanceJob").getOrCreate()

    plan = compaction_plan(spark, args.sf_dir)
    n_bins = plan.count()
    print(f"compaction plan: {n_bins} bins")

    write_compacted_files(spark, args.sf_dir, args.out)

    digest = f"CAST(SUM(CAST(h AS DECIMAL(38,0))) % {TD_MOD} AS BIGINT)"
    h = td_row_hash("events")
    d_in = (
        load_table(spark, args.sf_dir, "events")
        .select(h.alias("h")).agg(F.expr(digest)).collect()[0][0]
    )
    d_out = (
        spark.read.parquet(args.out)
        .select(h.alias("h")).agg(F.expr(digest)).collect()[0][0]
    )
    if d_in != d_out:
        print(f"DIGEST MISMATCH after rewrite: {d_in} != {d_out}",
              file=sys.stderr)
        return 1
    print(f"digest verified: {d_in}")

    if not args.skip_vacuum_report:
        for r in vacuum_plan(spark, args.sf_dir).collect():
            print(f"vacuum {r.event_type}: delete {r.n_files_delete} files "
                  f"({r.bytes_reclaimed} B) before {r.cutoff_day}, "
                  f"keep {r.n_files_keep}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Mechanized physical-plan lint over every registry key.

Builds each queries()[k] DataFrame at a tiny SF and scans its (initial
adaptive) executed plan for the scale anti-patterns this repo bans:

  CARTESIAN   CartesianProduct — an unbroadcast cross join is corpus²
  PY_ROW      BatchEvalPython — row-at-a-time Python in the plan (the
              Arrow stages — ArrowEvalPython / FlatMapGroupsInPandas /
              MapInPandas / FlatMapGroupsInPandasWithState — are the
              sanctioned Python path and are NOT flagged)
  GLOBAL_SORT Sort [...], true — a full-dataset global sort that
              survived into the plan (orderBy+limit compiles to
              TakeOrderedAndProject, so any remaining global sort is
              either intended layout work or a bug)
  GLOBAL_WIN  windowspecdefinition with an empty partition clause —
              a single-task window; legitimate ONLY over
              aggregate-bounded frames (distinct scores / lengths),
              never over corpus rows

Keys with a justified instance carry a WHITELIST entry naming the
reason; an un-whitelisted flag fails the lint (exit 1). The lint runs
plan construction only — trainer keys (bpe_learn_merges, kmeans_lloyd,
kcenter_coreset, …) execute their synchronization collects during
construction, which is why the default SF is the smallest fixture.

Usage: python tools/plan_lint.py [sf_dir]   (default sf0.001)
Writes PLANLINT.json {key: [flags]} for flagged keys only.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# key -> {flag: reason}; reasons are part of the audit record.
WHITELIST: dict[str, dict[str, str]] = {
    # distinct-value running aggregates: the windowed frame is the
    # DISTINCT score/length grid (feature-bounded), never corpus rows.
    "quantile_bucketize": {"GLOBAL_WIN": "distinct-length grid window"},
    "doc_length_survival": {"GLOBAL_WIN": "distinct-length grid window"},
    "pareto_frontier": {"GLOBAL_WIN": "distinct-score marks frame"},
    "curriculum_order": {"GLOBAL_WIN": "distinct-score offsets frame"},
    "quality_calibration_curve": {"GLOBAL_WIN": "distinct-score offsets frame"},
    "quality_rank_per_lang": {"GLOBAL_WIN": "per-(lang) offset frame, bucket-bounded"},
    "quality_threshold_sweep": {"GLOBAL_WIN": "threshold-grid frame (bounded)"},
    "vocab_prune_sweep": {"GLOBAL_WIN": "count-of-counts histogram frame (distinct-frequency-bounded)"},
    "zipf_fit_report": {"GLOBAL_WIN": "vocabulary-bounded rank frame (distinct words, never corpus rows)"},
    "rfm_segmentation": {"GLOBAL_WIN": "customer-dimension aggregate frame (|customers| rows, never order rows)"},
    "gini_revenue_lorenz": {"GLOBAL_WIN": "customer-dimension rank + 10-row decile grid frames"},
    "cusum_changepoint": {"GLOBAL_WIN": "date-grid cumulative frame (~2.4k distinct days, never order rows)"},
    "runs_test_daily": {"GLOBAL_WIN": "date-grid lag frame (~2.4k distinct days, never order rows)"},
    "hhi_by_nation": {"GLOBAL_WIN": "nation-dimension rank frame (~25 rows, never order rows)"},
    "vocab_growth_curve": {"GLOBAL_WIN": "checkpoint frame (n_docs/50 rows)"},
    "conversion_lag_curve": {"GLOBAL_WIN": "day-offset histogram (calendar-bounded)"},
    # rank-of-a-top-k: the window runs AFTER .limit(k) — k rows by
    # construction, never corpus rows.
    "key_skew_profile": {"GLOBAL_WIN": "ranks the limit-20 heavy-hitter frame"},
    "bpe_token_usage": {"GLOBAL_WIN": "ranks the limit-40 usage frame"},
    "rrf_fusion": {"GLOBAL_WIN": "ranks bounded per-system top-k lists"},
    # intended layout/global-order work:
    "zorder_layout": {"GLOBAL_SORT": "range partition + local sort IS the layout"},
    "train_shard_shuffle": {"GLOBAL_SORT": "per-shard sort is the written layout"},
}


def lint_plan(plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BatchEvalPython" in plan:
        flags.append("PY_ROW")
    if re.search(r"\bSort \[[^\]]*\], true\b", plan):
        flags.append("GLOBAL_SORT")
    # windowspecdefinition(<frame...>) with no leading partition column:
    # partition cols print before the ordering spec; an empty partition
    # shows the ordering expression (col ASC/DESC) as the FIRST token.
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        head = m.group(1).split(",")[0].strip()
        if " ASC" in head or " DESC" in head:
            flags.append("GLOBAL_WIN")
            break
    return flags


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from flinkproj_spark import registry
    from flinkproj_spark.session import build_session

    spark = build_session("plan_lint", cpus=8)
    flagged: dict[str, list[str]] = {}
    hard_fail = []
    for k, fn in registry.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # a key that cannot even plan is a failure
            flagged[k] = [f"PLAN_ERROR: {exc}"]
            hard_fail.append(k)
            continue
        finally:
            spark.catalog.clearCache()
        flags = lint_plan(plan)
        if flags:
            flagged[k] = flags
            allowed = WHITELIST.get(k, {})
            for f in flags:
                if f not in allowed:
                    hard_fail.append(f"{k}:{f}")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANLINT.json")
    record = {
        "flagged": flagged,
        "whitelist": WHITELIST,
        "violations": hard_fail,
    }
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(f"plan lint: {len(flagged)} flagged, {len(hard_fail)} violations")
    for v in hard_fail:
        print("VIOLATION", v)
    return 1 if hard_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Central registry: collects every operator module's QUERIES/ORACLE
into the driver contract consumed by __spark_entry__.py."""

from __future__ import annotations

import sys
import traceback
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flinkproj_spark.operators import clean, report

_MODULES = [clean, report]

# Module import order only matters as the fallback ordering for keys
# not named in _PRIORITY_KEYS (which fully covers the driver's ~50-key
# verification window each round).
_EXTENSION_MODULES = (
    "curation",
    "relational",
    "dedup",
    "similarity",
    "text",
    "retrieval",
    "multimodal",
    "sampling",
    "e2e",
    "tpch",
    "tpch2",
    "analytic",
    # round-10 family-seam split of the old monolithic analytic.py —
    # order here only affects fallback key ordering, never key identity
    "stats",
    "timeseries",
    "graph",
    "privacy",
    "screens",
)

# Key order == driver check order, and the driver's per-round
# correctness budget covers only the FIRST ~50 keys. Since round 6 the
# window is MECHANICAL, not hand-curated: it must equal
# tools/gen_catalog.expected_window() — never-driver-green keys first,
# then the stalest-green keys (derived from the committed
# CORRECTNESS_r*.json files), tie-broken by module order. Regenerate
# with `python tools/gen_catalog.py --window` after adding keys or
# after a new CORRECTNESS file lands;
# tests/test_contract.py::test_priority_window_is_mechanical pins the
# equality so a stale hand copy fails loudly.
_PRIORITY_KEYS = (
    "event_transition_matrix",  # last green r7
    "conversion_lag_curve",  # last green r7
    "rfm_segmentation",  # last green r7
    "customer_ltv_cohort",  # last green r7
    "ols_trend_monthly",  # last green r7
    "corr_pairs_report",  # last green r7
    "benford_deviation",  # last green r7
    "ewma_daily_anomaly",  # last green r7
    "twap_user_value",  # last green r7
    "seasonality_profile",  # last green r7
    "label_propagation",  # last green r7
    "k_anonymity_report",  # last green r7
    "l_diversity_report",  # last green r7
    "analyze_tables_report",  # last green r7
    "cms_heavy_hitters",  # last green r7
    "json_extract",  # last green r8
    "explode_data",  # last green r8
    "dim_join",  # last green r8
    "enrich_serialize",  # last green r8
    "ts_parse",  # last green r8
    "filter_valid",  # last green r8
    "format_tsv",  # last green r8
    "window_count",  # last green r8
    "late_split",  # last green r8
    "paragraph_dedup",  # last green r8
    "unigram_lm_score",  # last green r8
    "bigram_lm_score",  # last green r8
    "cross_snapshot_dedup",  # last green r8
    "embedding_quantize",  # last green r8
    "minhash_jaccard_estimate",  # last green r8
    "freshness_decay_weights",  # last green r8
    "pii_scan_report",  # last green r8
    "join_explosion_audit",  # last green r8
    "hll_distinct_report",  # last green r8
    "dedup_survivorship",  # last green r8
    "embedding_pca2_deflated",  # last green r8
    "range_partition_plan",  # last green r8
    "stratified_split_assign",  # last green r8
    "token_budget_allocator",  # last green r8
    "pipeline_report",  # last green r8
    "pipeline_curate",  # last green r8
    "pipeline_curate_v2",  # last green r8
    "funnel_steps",  # last green r8
    "retention_cohorts",  # last green r8
    "event_path_topk",  # last green r8
    "stickiness_dau_wau",  # last green r8
    "outlier_zscore",  # last green r8
    "chi2_lang_source",  # last green r8
    "gini_revenue_lorenz",  # last green r8
    "moment_stats_by_source",  # last green r8
)


def _reorder(d: dict) -> dict:
    """Priority keys first (those present), then the rest in module order."""
    head = {k: d[k] for k in _PRIORITY_KEYS if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


#: name -> formatted traceback for extension modules that failed to
#: import. A broken module must surface as an ERROR, not as silently
#: missing keys (the driver would misreport those as "not implemented").
IMPORT_ERRORS: dict[str, str] = {}


def _modules():
    # Imported lazily/defensively so one broken extension module doesn't
    # take down the whole contract — but loudly (stderr + IMPORT_ERRORS).
    mods = list(_MODULES)
    for name in _EXTENSION_MODULES:
        try:
            mod = __import__(f"flinkproj_spark.operators.{name}", fromlist=[name])
            mods.append(mod)
        except Exception:
            tb = traceback.format_exc()
            IMPORT_ERRORS[name] = tb
            print(
                f"[flinkproj_spark.registry] ERROR importing operators.{name} — "
                f"its query keys are DROPPED from the contract:\n{tb}",
                file=sys.stderr,
            )
    return mods


def broken() -> dict[str, str]:
    """Modules that failed to import, mapped to their tracebacks."""
    _modules()
    return dict(IMPORT_ERRORS)


def raw_keys() -> tuple[str, ...]:
    """Every registered key in plain module order, WITHOUT the
    _PRIORITY_KEYS reorder — the stable tie-break ordering used by the
    mechanized rotation ledger (tools/gen_catalog.py)."""
    out: list[str] = []
    for mod in _modules():
        out.extend(getattr(mod, "QUERIES", {}).keys())
    return tuple(out)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for key, fn in getattr(mod, "QUERIES", {}).items():
            if key in out:
                raise ValueError(f"duplicate query key {key!r}")
            out[key] = fn
    return _reorder(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        for key, sql in getattr(mod, "ORACLE", {}).items():
            out[key] = sql
    return _reorder(out)

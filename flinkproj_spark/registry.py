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
    "freshness_decay_weights",  # never checked
    "pii_scan_report",  # never checked
    "join_explosion_audit",  # never checked
    "hll_distinct_report",  # never checked
    "dedup_survivorship",  # never checked
    "embedding_pca2_deflated",  # never checked
    "range_partition_plan",  # never checked
    "stratified_split_assign",  # never checked
    "token_budget_allocator",  # never checked
    "gini_revenue_lorenz",  # never checked
    "moment_stats_by_source",  # never checked
    "autocorr_daily_revenue",  # never checked
    "cusum_changepoint",  # never checked
    "stickiness_dau_wau",  # never checked
    "runs_test_daily",  # never checked
    "t_closeness_report",  # never checked
    "hhi_by_nation",  # never checked
    "k_anonymity_repair",  # never checked
    "mad_outlier_report",  # never checked
    "anonymized_release",  # never checked
    "theil_sen_trend_monthly",  # never checked
    "winsorized_mean_by_source",  # never checked
    "seasonal_naive_backtest",  # never checked
    "pipeline_report",  # last green r3
    "pipeline_curate",  # last green r3
    "pipeline_curate_v2",  # last green r3
    "approx_percentile_stats",  # last green r3
    "funnel_steps",  # last green r3
    "retention_cohorts",  # last green r3
    "outlier_zscore",  # last green r3
    "event_path_topk",  # last green r3
    "anomaly_rolling_z",  # last green r3
    "pagerank_fixed",  # last green r3
    "chi2_lang_source",  # last green r3
    "zorder_layout",  # last green r3
    "json_extract",  # last green r4
    "explode_data",  # last green r4
    "dim_join",  # last green r4
    "enrich_serialize",  # last green r4
    "ts_parse",  # last green r4
    "filter_valid",  # last green r4
    "format_tsv",  # last green r4
    "window_count",  # last green r4
    "late_split",  # last green r4
    "paragraph_dedup",  # last green r4
    "unigram_lm_score",  # last green r4
    "bigram_lm_score",  # last green r4
    "cross_snapshot_dedup",  # last green r4
    "embedding_quantize",  # last green r4
    "minhash_jaccard_estimate",  # last green r4
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

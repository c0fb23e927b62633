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
    "hhi_by_nation",  # last green r8
    "mad_outlier_report",  # last green r8
    "theil_sen_trend_monthly",  # last green r8
    "winsorized_mean_by_source",  # last green r8
    "anomaly_rolling_z",  # last green r8
    "autocorr_daily_revenue",  # last green r8
    "cusum_changepoint",  # last green r8
    "runs_test_daily",  # last green r8
    "seasonal_naive_backtest",  # last green r8
    "pagerank_fixed",  # last green r8
    "t_closeness_report",  # last green r8
    "k_anonymity_repair",  # last green r8
    "anonymized_release",  # last green r8
    "zorder_layout",  # last green r8
    "neardup_semantic_verify",  # last green r9
    "data_card_report",  # last green r9
    "minhash_containment_estimate",  # last green r9
    "lsh_parameter_planner",  # last green r9
    "sessionize",  # last green r9
    "tpch_q1",  # last green r9
    "tpch_q3",  # last green r9
    "tpch_q5",  # last green r9
    "tpch_q6",  # last green r9
    "top_k_per_group",  # last green r9
    "window_functions",  # last green r9
    "session_window_agg",  # last green r9
    "set_except",  # last green r9
    "set_intersect",  # last green r9
    "global_topk",  # last green r9
    "rollup_counts",  # last green r9
    "asof_join",  # last green r9
    "asof_join_tolerance",  # last green r9
    "order_total_audit",  # last green r9
    "backfill_planner",  # last green r9
    "supplier_scorecard",  # last green r9
    "table_digest_report",  # last green r9
    "trade_flow_matrix",  # last green r9
    "dedup_substring",  # last green r9
    "winnow_overlap_pairs",  # last green r9
    "dedup_cluster_sizes",  # last green r9
    "pair_strategy_agreement",  # last green r9
    "substring_dedup_clean",  # last green r9
    "dedup_graph_kcore",  # last green r9
    "dedup_containment",  # last green r9
    "graph_degree_assortativity",  # last green r9
    "ann_topk_pq",  # last green r9
    "ann_pq_recall_eval",  # last green r9
    "ivf_pq_topk",  # last green r9
    "embedding_outliers",  # last green r9
    "char_gini_concentration",  # last green r9
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

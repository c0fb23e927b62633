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
    "dsir_importance_weights",  # never checked
    "bloom_semi_join",  # never checked
    "fk_integrity_report",  # never checked
    "shipping_lag_report",  # never checked
    "dedup_impact_report",  # never checked
    "dedup_edit_distance",  # never checked
    "source_jaccard_matrix",  # never checked
    "split_leakage_report",  # never checked
    "link_prediction_jaccard",  # never checked
    "graph_modularity_report",  # never checked
    "hard_negative_mining",  # never checked
    "semdedup_greedy_keep",  # never checked
    "kcenter_coreset",  # never checked
    "embedding_top_component",  # never checked
    "kmeans_lloyd",  # never checked
    "embedding_matryoshka_eval",  # never checked
    "vocab_prune_sweep",  # never checked
    "bpe_learn_merges",  # never checked
    "quality_calibration_curve",  # never checked
    "tokenizer_fertility",  # never checked
    "detokenize_roundtrip",  # never checked
    "pareto_frontier",  # never checked
    "quality_drift_by_source",  # never checked
    "vocab_growth_curve",  # never checked
    "kn_bigram_smoothed",  # never checked
    "next_word_suggest",  # never checked
    "zipf_fit_report",  # never checked
    "simpson_diversity_by_source",  # never checked
    "ks_drift_by_source",  # never checked
    "auc_length_by_source",  # never checked
    "epoch_schedule",  # never checked
    "curriculum_order",  # never checked
    "packing_efficiency_report",  # never checked
    "cep_pattern_matches",  # never checked
    "basket_pair_lift",  # never checked
    "analyze_tables_report",  # never checked
    "event_transition_matrix",  # never checked
    "label_propagation",  # never checked
    "cms_heavy_hitters",  # never checked
    "ewma_daily_anomaly",  # never checked
    "k_anonymity_report",  # never checked
    "conversion_lag_curve",  # never checked
    "ols_trend_monthly",  # never checked
    "corr_pairs_report",  # never checked
    "l_diversity_report",  # never checked
    "twap_user_value",  # never checked
    "rfm_segmentation",  # never checked
    "customer_ltv_cohort",  # never checked
    "seasonality_profile",  # never checked
    "benford_deviation",  # never checked
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

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
    "multimodal_frame_sample",  # last green r6
    "multimodal_resize",  # last green r6
    "multimodal_pcm_stats",  # last green r6
    "multimodal_phash_buckets",  # last green r6
    "dedup_phash_hamming",  # last green r6
    "stratified_sample",  # last green r6
    "importance_sample",  # last green r6
    "domain_mix",  # last green r6
    "train_shard_shuffle",  # last green r6
    "doc_chunking",  # last green r6
    "sequence_pack",  # last green r6
    "sliding_window_agg",  # last green r6
    "quantile_bucketize",  # last green r6
    "stratified_split",  # last green r6
    "pipeline_clean",  # last green r6
    "dsir_importance_weights",  # last green r7
    "bloom_semi_join",  # last green r7
    "fk_integrity_report",  # last green r7
    "shipping_lag_report",  # last green r7
    "dedup_impact_report",  # last green r7
    "dedup_edit_distance",  # last green r7
    "source_jaccard_matrix",  # last green r7
    "split_leakage_report",  # last green r7
    "link_prediction_jaccard",  # last green r7
    "graph_modularity_report",  # last green r7
    "hard_negative_mining",  # last green r7
    "semdedup_greedy_keep",  # last green r7
    "kcenter_coreset",  # last green r7
    "embedding_top_component",  # last green r7
    "kmeans_lloyd",  # last green r7
    "embedding_matryoshka_eval",  # last green r7
    "vocab_prune_sweep",  # last green r7
    "bpe_learn_merges",  # last green r7
    "quality_calibration_curve",  # last green r7
    "tokenizer_fertility",  # last green r7
    "detokenize_roundtrip",  # last green r7
    "pareto_frontier",  # last green r7
    "quality_drift_by_source",  # last green r7
    "vocab_growth_curve",  # last green r7
    "kn_bigram_smoothed",  # last green r7
    "next_word_suggest",  # last green r7
    "zipf_fit_report",  # last green r7
    "simpson_diversity_by_source",  # last green r7
    "ks_drift_by_source",  # last green r7
    "auc_length_by_source",  # last green r7
    "epoch_schedule",  # last green r7
    "curriculum_order",  # last green r7
    "packing_efficiency_report",  # last green r7
    "cep_pattern_matches",  # last green r7
    "basket_pair_lift",  # last green r7
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

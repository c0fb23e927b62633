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
    # --- never driver-checked: the 7 late-r5 keys the r5 verdict
    # --- queued, plus keys new in round 6 ---
    "ngram_novelty_score",
    "attribution_first_last",
    "eval_leak_report",
    "minhash_banding_sensitivity",
    "embedding_drift_report",
    "ivf_cell_balance_report",
    "rrf_fusion",
    # --- stalest greens: the r2 set displaced in r5 ---
    "cube_counts",
    "pivot_counts",
    "approx_distinct_counts",
    "dedup_minhash_lsh",
    "ann_topk_lsh_banded",
    # --- then the oldest r3 greens in module order ---
    "filter_funnel_report",
    "scd2_history",
    "cdc_merge_latest",
    "key_skew_profile",
    "embedding_dim_stats",
    "knn_label_vote",
    "text_lang_id",
    "doc_fingerprint",
    "text_tf_top_terms",
    "ngram_counts",
    "text_pii_redact",
    "doc_winnow_fingerprints",
    "lang_id_eval",
    "bigram_pmi_top",
    "gopher_quality_filter",
    "vocab_coverage",
    "bm25_topk",
    "corpus_stats",
    "corpus_health_report",
    "sample_exact_k",
    "tfidf_topk",
    "multimodal_meta",
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_pcm_stats",
    "multimodal_phash_buckets",
    "dedup_phash_hamming",
    "stratified_sample",
    "importance_sample",
    "domain_mix",
    "train_shard_shuffle",
    "doc_chunking",
    "sequence_pack",
    "sliding_window_agg",
    "quantile_bucketize",
    "stratified_split",
    "pipeline_clean",
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

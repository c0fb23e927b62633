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
    "lake_file_verdicts",  # never checked
    "approx_distinct_counts",  # oracled, never hash-verified (rows-only green r6)
    "approx_percentile_stats",  # oracled, never hash-verified (rows-only green r8)
    "tpch_q9",  # last green r5
    "tpch_q11",  # last green r5
    "tpch_q12",  # last green r5
    "tpch_q15",  # last green r5
    "tpch_q16",  # last green r5
    "tpch_q17",  # last green r5
    "tpch_q20",  # last green r5
    "tpch_q21",  # last green r5
    "grouping_sets_counts",  # last green r5
    "interval_join_pairs",  # last green r5
    "percentile_stats",  # last green r5
    "histogram_value",  # last green r5
    "time_rollup_multires",  # last green r5
    "ngram_novelty_score",  # last green r6
    "filter_funnel_report",  # last green r6
    "cube_counts",  # last green r6
    "pivot_counts",  # last green r6
    "attribution_first_last",  # last green r6
    "scd2_history",  # last green r6
    "cdc_merge_latest",  # last green r6
    "key_skew_profile",  # last green r6
    "dedup_minhash_lsh",  # last green r6
    "eval_leak_report",  # last green r6
    "minhash_banding_sensitivity",  # last green r6
    "ann_topk_lsh_banded",  # last green r6
    "embedding_dim_stats",  # last green r6
    "knn_label_vote",  # last green r6
    "embedding_drift_report",  # last green r6
    "ivf_cell_balance_report",  # last green r6
    "text_lang_id",  # last green r6
    "doc_fingerprint",  # last green r6
    "text_tf_top_terms",  # last green r6
    "ngram_counts",  # last green r6
    "text_pii_redact",  # last green r6
    "doc_winnow_fingerprints",  # last green r6
    "lang_id_eval",  # last green r6
    "bigram_pmi_top",  # last green r6
    "gopher_quality_filter",  # last green r6
    "vocab_coverage",  # last green r6
    "rrf_fusion",  # last green r6
    "bm25_topk",  # last green r6
    "corpus_stats",  # last green r6
    "corpus_health_report",  # last green r6
    "sample_exact_k",  # last green r6
    "tfidf_topk",  # last green r6
    "multimodal_meta",  # last green r6
    "multimodal_decode",  # last green r6
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

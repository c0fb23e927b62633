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
# correctness budget covers only the FIRST ~50 keys. After round 3,
# every key has a driver-green row EXCEPT incremental_rollup_merge
# (committed after the r3 check ran), so round 4's window leads with
# it plus every key NEW this round; the remaining budget re-verifies
# the LONGEST-AGO-green families (the §2/relational/TPC-H keys, green
# since rounds 1-2) as a regression sweep. The r3-verified 50 rotate
# to the tail in module order.
_PRIORITY_KEYS = (
    # never driver-verified (added after the r3 window ran)
    "incremental_rollup_merge",
    # --- new in round 4 (appended as implemented) ---
    "dedup_substring",
    "ann_topk_pq",
    "ann_pq_recall_eval",
    "ivf_pq_topk",
    "embedding_outliers",
    "bpe_pair_counts",
    "doc_length_survival",
    "pipeline_curate_v3",
    "schema_drift_report",
    "temperature_mix",
    "rolling_median",
    "quality_classifier_linear",
    "bigram_lm_score",
    "winnow_overlap_pairs",
    "dedup_cluster_sizes",
    "char_gini_concentration",
    "event_cooccurrence_lift",
    "pair_strategy_agreement",
    "substring_dedup_clean",
    "query_expansion_prf",
    "asof_join",             # redesigned in r4 (was degenerate) — needs a fresh row
    "asof_join_tolerance",
    # --- oldest green rows (round 1-2) — regression re-verification ---
    "json_extract",
    "explode_data",
    "dim_join",
    "enrich_serialize",
    "ts_parse",
    "filter_valid",
    "format_tsv",
    "window_count",
    "late_split",
    "paragraph_dedup",
    "unigram_lm_score",
    "cross_snapshot_dedup",
    "embedding_quantize",
    "minhash_jaccard_estimate",
    "neardup_semantic_verify",
    "sessionize",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "top_k_per_group",
    "window_functions",
    "session_window_agg",
    "set_except",
    "set_intersect",
    "global_topk",
    "rollup_counts",
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

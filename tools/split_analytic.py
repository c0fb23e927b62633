"""One-shot round-10 refactor driver: split operators/analytic.py
(5,000+ lines) along its family seams into stats / timeseries / graph /
privacy / screens sibling modules, pure-move (source text of every
block is sliced verbatim), with operators/analytic.py keeping the
product-analytics remainder plus import-path-compatibility re-exports.

Kept in tools/ as the audit record of HOW the split was produced; it is
idempotence-guarded (refuses to run twice).
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SRC = REPO / "flinkproj_spark" / "operators" / "analytic.py"

# name -> destination module (everything unlisted stays in analytic)
MAP: dict[str, str] = {}
for mod, names in {
    "stats": [
        "percentile_stats", "APS_BAND_PCT", "approx_percentile_stats",
        "histogram_value", "outlier_zscore", "chi2_lang_source",
        "ols_trend_monthly", "corr_pairs_report", "moment_stats_by_source",
        "BENFORD_PPM", "benford_deviation", "gini_revenue_lorenz",
        "winsorized_mean_by_source", "mad_outlier_report", "hhi_by_nation",
        "theil_sen_trend_monthly",
    ],
    "timeseries": [
        "time_rollup_multires", "_ROLL_WIN", "_ROLL_MIN", "anomaly_rolling_z",
        "rolling_median", "EWMA_WEIGHTS", "EWMA_WSUM", "EWMA_FLAG_PCT",
        "ewma_daily_anomaly", "_EWMA_TERMS", "_EWMA_LAGS", "ACF_LAGS",
        "autocorr_daily_revenue", "cusum_changepoint", "seasonality_profile",
        "seasonal_naive_backtest", "twap_user_value", "interevent_gap_profile",
        "runs_test_daily",
    ],
    "graph": [
        "_PR_SCALE", "_PR_ITERS", "(_PR_DAMP_NUM, _PR_DAMP_DEN)", "_PR_TOP",
        "pagerank_fixed", "_LPA_ITERS", "_LPA_TOP", "label_propagation",
        "_PR_BASE", "_PR_ITER_SQL", "_LPA_ITER_SQL",
    ],
    "privacy": [
        "K_ANON_QIDS", "K_ANON_KS", "k_anonymity_report",
        "L_DIV_QID_BUCKET_C", "L_DIV_LS", "l_diversity_report",
        "t_closeness_report", "K_REPAIR", "k_anonymity_repair",
        "anonymized_release", "dp_sensitivity_report", "DP_CLAMP_GRID",
        "DP_CLAMP_PCT", "dp_clamped_release",
    ],
    "screens": [
        "_IVM_T0", "incremental_rollup_merge",
        "_DRIFT_COLS", "schema_drift_report", "_ANALYZE_COLS",
        "analyze_tables_report", "CMS_D", "CMS_W", "CMS_TOP", "cms_hash_rows",
        "cms_heavy_hitters", "_CMS_BK", "_Z_BITS", "zorder_layout",
        "_Z_INTERLEAVE_SQL", "QSK_SUB", "QSK_TOP", "qsk_bucket_col",
        "qsk_hi_col", "qsk_decile_estimates", "quantile_sketch_audit",
        "JSA_BROADCAST_MAX_ROWS", "JSA_SKEW_FANOUT", "JSA_EDGES",
        "join_strategy_advisor", "_JSA_VALUES", "SRM_SALT", "CONF_SALT",
        "CONF_PCT", "srm_check", "conformal_coverage_report", "ZM_PROBES",
        "ZM_BITS", "zm_zorder_rows", "zonemap_effectiveness",
        "_ZM_INTERLEAVE_SQL", "<assert>",
    ],
}.items():
    for n in names:
        MAP[n] = mod

MODULES = ("stats", "timeseries", "graph", "privacy", "screens", "analytic")

DOCSTRINGS = {
    "stats": '"""Distribution / robust statistics over the corpus: exact and\n'
    "self-auditing percentiles, z/MAD outlier screens, OLS & Theil-Sen\n"
    "trends, correlation, moments, Benford, Gini/Lorenz, HHI. Split out\n"
    "of operators/analytic.py in round 10 (pure move — same operators,\n"
    'same oracles, same hashes)."""',
    "timeseries": '"""Time-series operators: multi-resolution rollups, rolling\n'
    "robust stats, EWMA/CUSUM anomaly screens, autocorrelation,\n"
    "seasonality, backtests, TWAP, inter-event gap profiles. Split out\n"
    'of operators/analytic.py in round 10 (pure move)."""',
    "graph": '"""Iterative graph analytics over the event interaction graph:\n'
    "fixed-point PageRank and synchronous label propagation — bounded\n"
    "rounds, integer arithmetic, oracle-replayable. Split out of\n"
    'operators/analytic.py in round 10 (pure move)."""',
    "privacy": '"""Privacy / disclosure-risk operators: k-anonymity report &\n'
    "repair ladder, l-diversity, t-closeness, anonymized release, DP\n"
    "sensitivity & clamped release. Split out of operators/analytic.py\n"
    'in round 10 (pure move)."""',
    "screens": '"""Warehouse audit screens & sketch audits: schema drift,\n'
    "ANALYZE-style stats, CMS/quantile sketch audits, z-order & zone-map\n"
    "layout effectiveness, join-strategy advisor, SRM and conformal\n"
    "coverage experiment screens. Split out of operators/analytic.py in\n"
    'round 10 (pure move)."""',
}

IMPORT_LINES = [
    "from __future__ import annotations",
    "",
    "from pyspark.sql import DataFrame, SparkSession, Window",
    "from pyspark.sql import functions as F",
    "",
    "from flinkproj_spark.operators.relational import TD_MOD, _cents",
    "from flinkproj_spark.sources.tables import load_table",
]


def node_name(n) -> str:
    if isinstance(n, (ast.FunctionDef, ast.ClassDef)):
        return n.name
    if isinstance(n, ast.Assign):
        return ast.unparse(n.targets[0])
    if isinstance(n, ast.Assert):
        return "<assert>"
    return ast.unparse(n)[:40]


def main() -> None:
    src = SRC.read_text()
    if "round-10 family-seam split" in src:
        raise SystemExit("already split — refusing to run twice")
    lines = src.splitlines()
    tree = ast.parse(src)

    # owning module per QUERIES/ORACLE key = module of the function
    def key_owner(key: str) -> str:
        return MAP.get(key, "analytic")

    segments: list[tuple[str, str]] = []  # (module, text)
    body = [n for n in tree.body]
    prev_end = 0
    for n in body:
        gap = "\n".join(lines[prev_end : n.lineno - 1])
        text = "\n".join(lines[n.lineno - 1 : n.end_lineno])
        prev_end = n.end_lineno
        name = node_name(n)

        if n.lineno <= 31:  # module docstring + import header: regenerated
            continue
        if name == "QUERIES" and isinstance(n, ast.Assign) and isinstance(
            n.value, ast.Dict
        ):
            # central dict: distribute entries verbatim, preserving order
            per: dict[str, list[str]] = {m: [] for m in MODULES}
            for k, v in zip(n.value.keys, n.value.values):
                per[key_owner(ast.literal_eval(k))].append(
                    f'    "{ast.literal_eval(k)}": {ast.unparse(v)},'
                )
            for m, entries in per.items():
                if entries:
                    segments.append(
                        (m, "QUERIES = {\n" + "\n".join(entries) + "\n}")
                    )
            continue
        if name == "ORACLE" and isinstance(n, ast.Assign) and isinstance(
            n.value, ast.Dict
        ):
            per = {m: [] for m in MODULES}
            for k, v in zip(n.value.keys, n.value.values):
                entry = "\n".join(lines[k.lineno - 1 : v.end_lineno])
                # keep the original "key": value source, re-indented as-is
                per[key_owner(ast.literal_eval(k))].append(entry.rstrip(","))
            for m, entries in per.items():
                if entries:
                    segments.append(
                        (m, "ORACLE = {\n" + ",\n".join(entries) + ",\n}")
                    )
            continue
        m = re.match(r"(QUERIES|ORACLE)\['([^']+)'\]", name)
        if m:
            dest = key_owner(m.group(2))
        else:
            dest = MAP.get(name, "analytic")
        # attach the preceding comment/section gap to this segment
        gap = gap.strip("\n")
        seg = (gap + "\n" + text) if gap else text
        segments.append((dest, seg))

    # assemble modules
    moved_names: dict[str, list[str]] = {m: [] for m in MODULES}
    for name, dest in MAP.items():
        if name.startswith("("):
            moved_names[dest].extend(
                x.strip() for x in name.strip("()").split(",")
            )
        elif name.isidentifier():
            moved_names[dest].append(name)

    for mod in MODULES:
        segs = [s for d, s in segments if d == mod]
        if mod == "analytic":
            continue  # handled below
        bodytxt = "\n\n\n".join(segs) + "\n"
        xmod_import = ""
        if 'ORACLE["ols_trend_monthly"]}' in bodytxt and mod != "stats":
            # the one cross-family oracle composition: seasonality's
            # residuals ride the OLS oracle, which now lives in stats
            bodytxt = bodytxt.replace(
                '{ORACLE["ols_trend_monthly"]}',
                '{_STATS_ORACLE["ols_trend_monthly"]}',
            )
            xmod_import = (
                "\nfrom flinkproj_spark.operators.stats import "
                "ORACLE as _STATS_ORACLE"
            )
        init = ""
        if not any(s.startswith("QUERIES = {") for s in segs):
            init += "QUERIES = {}\n"
        if not any(s.startswith("ORACLE = {") for s in segs):
            init += "ORACLE = {}\n"
        if init:
            init += "\n\n"
        imports = "\n".join(
            ln
            for ln in IMPORT_LINES
            if not ln
            or ln.startswith("from __future__")
            or any(
                re.search(rf"\b{tok}\b", bodytxt)
                for tok in re.findall(r"import (.+)$", ln)[0]
                .replace(" as F", "")
                .split(", ")
            )
            or (" as F" in ln and re.search(r"\bF\.", bodytxt))
        )
        out = (
            DOCSTRINGS[mod]
            + "\n\n"
            + imports
            + xmod_import
            + "\n\n"
            + init
            + bodytxt
        )
        (REPO / "flinkproj_spark" / "operators" / f"{mod}.py").write_text(out)
        print(f"wrote {mod}.py ({out.count(chr(10))} lines)")

    # remainder analytic.py
    segs = [s for d, s in segments if d == "analytic"]
    compat = []
    for mod in ("stats", "timeseries", "graph", "privacy", "screens"):
        names = ", ".join(moved_names[mod])
        compat.append(
            f"from flinkproj_spark.operators.{mod} import (  # noqa: E402,F401\n"
            + "\n".join(
                f"    {n}," for n in moved_names[mod]
            )
            + "\n)"
        )
    head = "\n".join(lines[0:21])  # original module docstring
    out = (
        head
        + "\n\n"
        + "\n".join(IMPORT_LINES)
        + "\n\n"
        + "\n\n\n".join(segs)
        + "\n\n\n"
        + "# ---------------------------------------------------------------------------\n"
        + "# Import-path compatibility for the round-10 family-seam split: every\n"
        + "# name that lived here before the split remains importable from\n"
        + "# operators.analytic (tests, streaming twins, and downstream users\n"
        + "# predate it). QUERIES/ORACLE entries, however, live ONLY in the seam\n"
        + "# modules — the registry collects each key exactly once.\n"
        + "# ---------------------------------------------------------------------------\n"
        + "\n".join(compat)
        + "\n"
    )
    SRC.write_text(out)
    print(f"rewrote analytic.py ({out.count(chr(10))} lines)")


if __name__ == "__main__":
    main()

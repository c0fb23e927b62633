"""Whole-contract guards: every registered key must (a) build and
analyze a Spark plan and (b) ship a DuckDB-parseable oracle. These run
in seconds (no execution) and catch drift — a renamed column, a broken
import, a SQL typo — long before the full oracle harness would."""

from __future__ import annotations

import duckdb
import pytest

from flinkproj_spark import registry
from flinkproj_spark.sources.tables import TABLES


def test_every_query_key_analyzes(spark, sf_dir):
    """Force Catalyst analysis (not execution) of every key's plan."""
    failures = {}
    for key, fn in registry.queries().items():
        try:
            df = fn(spark, sf_dir)
            df.schema  # triggers analysis
        except Exception as e:  # noqa: BLE001 — collecting all failures
            failures[key] = repr(e)[:200]
    assert not failures, failures


def test_every_oracle_sql_parses(sf_dir):
    """EXPLAIN every oracle statement against the real table schemas."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = {}
    for key, sql in registry.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            failures[key] = repr(e)[:200]
    assert not failures, failures


def test_oracle_keys_subset_of_queries():
    q, o = registry.queries(), registry.oracle_sql()
    assert set(o) <= set(q)
    rows_only = set(q) - set(o)
    # rows-only keys must stay an explicit, named set — additions here
    # need a justification (sketches / non-SQL-expressible only). Since
    # round 10 the set is EMPTY: the two sketch keys were re-shaped into
    # the self-auditing audit-twin pattern (exact anchor + within-band
    # verdict the oracle pins to 1), so every registered key is oracled.
    assert rows_only == set()


def test_cli_list_and_oracle(capsys, sf_dir):
    from flinkproj_spark.__main__ import main

    assert main(["list", "--filter", "tpch_q6"]) == 0
    out = capsys.readouterr().out
    assert "tpch_q6\toracle" in out
    assert main(["oracle", "tpch_q6", "--sf-dir", sf_dir]) == 0
    assert "revenue" in capsys.readouterr().out
    assert main(["run", "definitely_not_a_key"]) == 2


def test_query_count_matches_readme():
    import re
    from pathlib import Path

    readme = Path(__file__).resolve().parent.parent / "README.md"
    m = re.search(r"\*\*(\d+) registered query keys\*\*", readme.read_text())
    assert m, "README coverage bullet missing"
    assert int(m.group(1)) == len(registry.queries()), (
        "README key count drifted from registry — update the Coverage section"
    )


def test_funnel_v3_counts_equal_pipeline_outputs(spark, sf_dir):
    """The funnel-wide invariant (observability twin of the rollup
    merge-equals-recompute pin): filter_funnel_v3's stage counts must
    equal the pipeline keys' own output row counts — if the report
    and the pipelines ever computed different funnels, this breaks."""
    from flinkproj_spark.operators.e2e import (
        filter_funnel_v3,
        pipeline_curate,
        pipeline_curate_v2,
        pipeline_curate_v3,
    )

    row = filter_funnel_v3(spark, sf_dir).collect()[0]
    spark.catalog.clearCache()
    assert row.n_after_neardup == pipeline_curate(spark, sf_dir).count()
    assert row.n_after_semantic == pipeline_curate_v2(spark, sf_dir).count()
    assert row.n_after_decontam == pipeline_curate_v3(spark, sf_dir).count()
    # the funnel is monotone by construction; prove the stages are live
    assert row.n_total >= row.n_gated >= row.n_exact >= row.n_after_neardup
    assert row.n_after_neardup >= row.n_after_decontam
    assert row.n_gated < row.n_total
    assert row.n_after_decontam > 0
    spark.catalog.clearCache()


def test_attribution_last_touch_equals_asof_join(spark, sf_dir):
    """Cross-key invariant: the last-touch column of the multi-model
    attribution key must equal asof_join's match for every purchase —
    two formulations of one model can never drift."""
    from flinkproj_spark.operators.relational import asof_join, attribution_first_last

    last = {
        r.purchase_id: r.last_touch_id
        for r in attribution_first_last(spark, sf_dir).collect()
    }
    asof = {r.purchase_id: r.touch_id for r in asof_join(spark, sf_dir).collect()}
    assert last == asof and len(last) > 0


def test_detokenize_roundtrip_fidelity(spark, sf_dir):
    """The tokenizer's shipping invariant: decode(encode(x)) is EXACT
    on every OOV-free document, and on lossy documents the damage never
    exceeds the OOV positions (each OOV symbol is one character wide).
    Both populations must be live or the audit proves nothing."""
    from flinkproj_spark.operators.text import detokenize_roundtrip

    rows = detokenize_roundtrip(spark, sf_dir).collect()
    clean = [r for r in rows if r.n_oov == 0]
    lossy = [r for r in rows if r.n_oov > 0]
    assert clean and lossy, (len(clean), len(lossy))
    assert all(r.exact_match == 1 and r.char_diff == 0 for r in clean)
    assert all(r.exact_match == 0 and 0 < r.char_diff <= r.n_oov for r in lossy)


def test_catalog_is_current():
    """CATALOG.md must list exactly the registered keys — regenerate
    with tools/gen_catalog.py after adding operators."""
    import re
    from pathlib import Path

    text = (Path(__file__).resolve().parent.parent / "CATALOG.md").read_text()
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.M))
    assert listed == set(registry.queries()), (
        sorted(listed ^ set(registry.queries()))
    )
    # pin the 5-column ledger format so a stale pre-ledger CATALOG.md
    # (no "last green" column) fails even when the key set matches
    assert "| key | module | check | last green | what |" in text


def test_priority_window_is_mechanical():
    """_PRIORITY_KEYS must equal tools/gen_catalog.expected_window():
    never-driver-green keys first, then stalest-green, from the
    git-tracked CORRECTNESS_r*.json ledger. A hand-stale copy (e.g.
    after a new CORRECTNESS file lands or a key is added) fails here —
    regenerate with `python tools/gen_catalog.py --window`."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import gen_catalog

    assert tuple(registry._PRIORITY_KEYS) == gen_catalog.expected_window(), (
        "stale _PRIORITY_KEYS — run `python tools/gen_catalog.py --window` "
        "and paste the result into flinkproj_spark/registry.py"
    )


def test_plan_lint_whitelist_is_live():
    """Every plan-lint whitelist entry must name a registered key and a
    real lint flag — dead entries would silently shrink the lint's
    coverage as keys are renamed."""
    from flinkproj_spark import registry
    from tools.plan_lint import WHITELIST

    keys = set(registry.queries())
    known_flags = {"CARTESIAN", "PY_ROW", "GLOBAL_SORT", "GLOBAL_WIN"}
    for k, flags in WHITELIST.items():
        assert k in keys, f"whitelisted key {k} not in registry"
        assert set(flags) <= known_flags, (k, flags)

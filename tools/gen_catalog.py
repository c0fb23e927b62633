"""Generate CATALOG.md: one row per registered query key — owning
module, oracle kind, last driver-green round, and the first docstring
line — so the operator inventory AND the rotation ledger are auditable
at a glance without walking the source.

Also the mechanized rotation ledger (round-5 verdict task 2): the
driver's per-round correctness budget covers only the first ~50 keys of
registry.queries(), so _PRIORITY_KEYS in registry.py must always be
(keys with no driver-green row yet) + (stalest-green keys) up to the
window size. `ledger()` derives per-key last-green rounds from the
committed CORRECTNESS_r*.json files; `expected_window()` computes the
window _PRIORITY_KEYS must equal (pinned by tests/test_contract.py).

Usage:
    python tools/gen_catalog.py            # rewrite CATALOG.md
    python tools/gen_catalog.py --window   # print the paste-able
                                           # _PRIORITY_KEYS tuple body
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flinkproj_spark import registry  # noqa: E402

#: Driver per-round correctness budget (keys checked per round).
WINDOW = 50


def _row_green(row: dict) -> bool:
    """A driver row counts as green if the value hash matched, or it is
    a declared rows-only sketch (err == 'no_oracle') that produced rows."""
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    return row.get("err") is None and bool(row.get("hash_match"))


def _correctness_files() -> list[str]:
    """The CORRECTNESS_r*.json files the ledger is derived from —
    git-TRACKED files only, so expected_window() can never depend on an
    untracked local file (a new driver drop must be committed in the
    same change that regenerates _PRIORITY_KEYS). Falls back to a
    working-tree glob only outside a git checkout."""
    try:
        out = subprocess.run(
            ["git", "-C", REPO, "ls-files", "CORRECTNESS_r*.json"],
            capture_output=True, text=True, check=True,
        ).stdout.split()
        return sorted(os.path.join(REPO, p) for p in out)
    except (OSError, subprocess.CalledProcessError):
        return sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))


def _ledgers() -> tuple[dict[str, int | None], dict[str, int | None]]:
    """(last_any_green, last_hash_green) per key, from the git-tracked
    CORRECTNESS_r*.json files.

    last_any_green counts rows-only ``no_oracle`` rows (the pre-round-10
    evidence grade for the sketch keys); last_hash_green counts only
    value-hash-matched rows — the strong grade every key is held to now
    that the whole registry is oracled.
    """
    last_any: dict[str, int | None] = {k: None for k in registry.raw_keys()}
    last_hash: dict[str, int | None] = dict(last_any)
    for path in _correctness_files():
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        for key, row in json.load(open(path)).items():
            if key not in last_any or not _row_green(row):
                continue
            prev = last_any[key]
            last_any[key] = rnd if prev is None else max(prev, rnd)
            if row.get("err") is None and row.get("hash_match"):
                prev_h = last_hash[key]
                last_hash[key] = rnd if prev_h is None else max(prev_h, rnd)
    return last_any, last_hash


def ledger() -> dict[str, int | None]:
    """key -> last round with a driver-GREEN row (None if never green).

    Reads every git-tracked CORRECTNESS_r*.json. A key whose only rows
    are failures stays None — it is as urgent as a never-checked key.
    """
    return _ledgers()[0]


def expected_window(n: int = WINDOW) -> tuple[str, ...]:
    """The window _PRIORITY_KEYS must equal, ranked by evidence grade:

    tier 0 — never driver-green at all;
    tier 1 — oracled key whose only green rows are retired rows-only
             ``no_oracle`` rows (no hash-verified row ever): the oracle
             exists but the driver has never confirmed it, so these
             lead every hash-green key (round-11 verdict task 1);
    tier 2 — hash-green, stalest first.

    Ties broken by module order (registry.raw_keys).
    """
    raw = registry.raw_keys()
    idx = {k: i for i, k in enumerate(raw)}
    last_any, last_hash = _ledgers()
    oracled = set(registry.oracle_sql())

    def tier(k: str) -> int:
        if last_any[k] is None:
            return 0
        if k in oracled and last_hash[k] is None:
            return 1
        return 2

    ranked = sorted(
        raw,
        key=lambda k: (tier(k), last_any[k] or 0, idx[k]),
    )
    return tuple(ranked[:n])


def main(argv: list[str]) -> None:
    if "--window" in argv:
        last_any, last_hash = _ledgers()
        print(f"# expected _PRIORITY_KEYS window ({WINDOW} keys) — paste into registry.py")
        for k in expected_window():
            if last_any[k] is None:
                age = "never checked"
            elif last_hash[k] is None:
                age = f"oracled, never hash-verified (rows-only green r{last_any[k]})"
            else:
                age = f"last green r{last_hash[k]}"
            print(f'    "{k}",  # {age}')
        return

    qs = registry.queries()
    oracles = registry.oracle_sql()
    last = ledger()
    n_rowless = sum(1 for v in last.values() if v is None)
    lines = [
        "# CATALOG — every registered query key",
        "",
        "Generated by `tools/gen_catalog.py`; regenerate after adding keys.",
        "`oracle` keys are value-hash-verified against DuckDB each round",
        "(since round 10 that is EVERY key — the two sketch keys were",
        "re-shaped into self-auditing exact-anchor + within-band-verdict",
        "outputs). `last green` is the most recent round",
        "with a driver-green CORRECTNESS row (the rotation ledger —",
        "`_PRIORITY_KEYS` must equal the never-green + stalest keys, pinned",
        "by `tests/test_contract.py::test_priority_window_is_mechanical`).",
        "",
        f"{len(qs)} keys, {len(oracles)} with oracles, "
        f"{n_rowless} awaiting a first driver row.",
        "",
        "| key | module | check | last green | what |",
        "|---|---|---|---|---|",
    ]
    for key, fn in qs.items():
        mod = fn.__module__.replace("flinkproj_spark.operators.", "")
        doc = (fn.__doc__ or "").strip().splitlines()
        first = doc[0].strip() if doc else ""
        # collapse to one sentence-ish fragment
        for stop in (". ", ".\n"):
            if stop in first:
                first = first.split(stop)[0] + "."
                break
        kind = "oracle" if key in oracles else "rows-only"
        age = "—" if last.get(key) is None else f"r{last[key]}"
        first = first.replace("|", "\\|")
        lines.append(f"| `{key}` | {mod} | {kind} | {age} | {first} |")
    out = os.path.join(REPO, "CATALOG.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(qs)} keys")


if __name__ == "__main__":
    main(sys.argv[1:])

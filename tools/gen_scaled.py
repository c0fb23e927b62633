"""Deterministic tiled scale-up of the sf0.1 corpus — the empirical
half of SCALING.md: every 100 TB claim in the operator docstrings is a
plan-shape argument (bucketed candidate generation, map-side combine,
calendar-bounded state); this tool manufactures the DATA to check the
claims' consequence — near-linear runtime growth — on the only host we
have.

Replication contract (round-11 verdict task 4; tag density fixed v3):
  * `documents` — doc_id offset by a per-replica stride; for replica
    r > 0 every 2nd whitespace token (indices 1, 3, 5, …) gets a `~r`
    suffix (single-token docs tag their only token, so even they
    differ pairwise across replicas). Two docs that
    were (near-)duplicates inside a replica STAY duplicates (the
    perturbation is the same function of position for every doc), but
    cross-replica pairs lose almost every shingle in common, so the
    corpus-wide duplicate RATE is invariant under tiling — without the
    perturbation every replica would near-dup-match every other and the
    candidate-pair count would grow quadratically in the tile factor by
    construction, measuring the data generator instead of the operator.
    n_chars is recomputed from the perturbed text.

    v2 tagged every 3RD token (indices 2, 5, …), which violated this
    contract for the exact WORD-SET strategies (round 13, measured at
    x30): (a) cross-replica copies of one doc kept 2/3 of their
    distinct words, so their word-set Jaccard was (2n/3)/(4n/3) = 0.5
    — exactly AT dedup_ngram_jaccard's >= 0.5 threshold — and (b) the
    first two words were never tagged, so the lang|w1-w2 Jaccard
    block key was identical across replicas and every block's member
    count grew with the factor (quadratic in-row pair expansion up to
    BUCKET_CAP, whole blocks silently dropped past it). Measured at
    x30: 533,619 Jaccard pairs of which 466,001 were cross-replica
    same-doc (mean J 0.533) and 38,802 cross-replica cross-doc —
    87% generator artifact, pair count super-linear by construction.
    Tagging every 2nd token makes cross-replica word-set Jaccard
    (n/2)/(3n/2) = 1/3 < 0.5 and puts a tagged token (index 1) into
    the block key, so blocks stay within-replica and the pair count
    tiles linearly, which is what a genuinely larger corpus does.
  * `embeddings` — vec_id offset; for r > 0 each dimension j is
    multiplied by a deterministic ±1 drawn from (r, j) (a diagonal
    orthogonal transform): within-replica distances, norms, and
    neighbour structure are EXACTLY preserved, while cross-replica
    vectors decorrelate, so ANN/LSH bucket occupancy scales the way a
    genuinely larger corpus would.
  * `events` — event_id/user_id offset; ts/value/props unchanged, so
    the calendar stays 30 days and per-day volume grows with the
    factor (a lake ingesting more per day, which is what growth looks
    like — the (type x day) inventory grid stays calendar-bounded).
  * All other tables are symlinked verbatim (dims; the TPC-H relations
    are not scale-bench targets — none is in the r10 top-15).

Everything is a pure function of (row, replica), no RNG state: DuckDB
can recompute any oracle on the tiled parquet, and regenerating the
corpus bit-reproduces it.

Usage:
    python tools/gen_scaled.py --factor 10 [--src /root/testdata/sf0.1]
                               [--out .scaled/x10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: id stride between replicas — far above any real id, power of ten so
#: a tiled id is readable as (replica, original id).
STRIDE = 10_000_000

TILED = ("documents", "embeddings", "events")


def _perturb_text(text: str, r: int) -> str:
    if r == 0 or not text:
        return text
    toks = text.split(" ")
    tag = f"~{r}"
    if len(toks) < 2:
        # single-token docs have no position i % 2 == 1 — tag the one
        # token so they too differ across replicas (else exact
        # cross-replica dup pairs for them grow quadratically).
        toks[-1] = toks[-1] + tag
        return " ".join(toks)
    return " ".join(t + tag if i % 2 == 1 else t for i, t in enumerate(toks))


def _sign_row(r: int, dim: int) -> np.ndarray:
    """Deterministic ±1 per (replica, dimension) — replica 0 is the
    identity; replicas differ pairwise.

    The hash must MIX r and j before the 1-bit reduction: the earlier
    `(r*odd1 + j*odd2) % 2` collapsed to `(r + j) % 2` (both multipliers
    odd), making all same-parity replicas share one sign vector — i.e.
    bitwise-identical embeddings across replicas for factor >= 4, which
    inflated cross-replica ANN/near-dup candidate pairs quadratically.
    Now: multiply-xor mix, then take a HIGH bit (the low bit of a
    product of odds is parity again).
    """
    if r == 0:
        return np.ones(dim, dtype=np.float32)
    j = np.arange(dim, dtype=np.uint64)
    h = np.uint64(r) * np.uint64(0x9E3779B1) ^ j * np.uint64(0x85EBCA6B)
    h ^= h >> np.uint64(16)
    h *= np.uint64(0x27D4EB2F165667C5)
    h ^= h >> np.uint64(29)
    bit = (h >> np.uint64(17)) & np.uint64(1)
    return np.where(bit == 0, 1.0, -1.0).astype(np.float32)


def tile_documents(src: str, out: str, factor: int) -> int:
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    doc_id = t.column("doc_id").to_numpy()
    text = t.column("text").to_pylist()
    lang = t.column("lang")
    source = t.column("source")
    parts = []
    for r in range(factor):
        new_text = [_perturb_text(x, r) for x in text]
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(doc_id + r * STRIDE, pa.int64()),
                    "text": pa.array(new_text, pa.string()),
                    "lang": lang,
                    "source": source,
                    "n_chars": pa.array(
                        [len(x) if x is not None else None for x in new_text],
                        pa.int64(),
                    ),
                }
            )
        )
    full = pa.concat_tables(parts)
    pq.write_table(full, os.path.join(out, "documents.parquet"))
    return full.num_rows


def tile_embeddings(src: str, out: str, factor: int) -> int:
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    vec_id = t.column("vec_id").to_numpy()
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    label = t.column("label")
    dim = vecs.shape[1]
    parts = []
    for r in range(factor):
        flipped = vecs * _sign_row(r, dim)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_id + r * STRIDE, pa.int64()),
                    "embedding": pa.array(
                        [row for row in flipped.tolist()], pa.list_(pa.float32())
                    ),
                    "label": label,
                }
            )
        )
    full = pa.concat_tables(parts)
    pq.write_table(full, os.path.join(out, "embeddings.parquet"))
    return full.num_rows


def tile_events(src: str, out: str, factor: int) -> int:
    t = pq.read_table(os.path.join(src, "events.parquet"))
    event_id = t.column("event_id").to_numpy()
    user_id = t.column("user_id").to_numpy()
    parts = []
    for r in range(factor):
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(event_id + r * STRIDE, pa.int64()),
                    "ts": t.column("ts"),
                    "user_id": pa.array(user_id + r * STRIDE, pa.int64()),
                    "event_type": t.column("event_type"),
                    "value": t.column("value"),
                    "props": t.column("props"),
                }
            )
        )
    full = pa.concat_tables(parts)
    pq.write_table(full, os.path.join(out, "events.parquet"))
    return full.num_rows


def generate(src: str, out: str, factor: int) -> dict:
    os.makedirs(out, exist_ok=True)
    counts = {
        "documents": tile_documents(src, out, factor),
        "embeddings": tile_embeddings(src, out, factor),
        "events": tile_events(src, out, factor),
    }
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet") or f.split(".")[0] in TILED:
            continue
        dst = os.path.join(out, f)
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(os.path.join(src, f)), dst)
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--factor", type=int, default=10)
    a = ap.parse_args()
    out = a.out or os.path.join(REPO, ".scaled", f"x{a.factor}")
    counts = generate(a.src, out, a.factor)
    print({"out": out, "factor": a.factor, "rows": counts})


if __name__ == "__main__":
    main()

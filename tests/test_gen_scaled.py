"""Pin tools/gen_scaled.py's replication contract — the scale-bench
evidence (SCALE_BENCH*.json exponents) is only as good as the tiled
corpus's duplicate-rate invariance. Round-11 advice found the original
sign hash collapsed to (r + j) % 2, making same-parity replicas
bitwise-identical (quadratic cross-replica candidate inflation); these
tests make that class of regression loud.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from gen_scaled import _perturb_text, _sign_row  # noqa: E402


def test_sign_rows_pairwise_distinct():
    dim = 128
    rows = [_sign_row(r, dim) for r in range(32)]
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            assert not np.array_equal(rows[a], rows[b]), (
                f"replicas {a} and {b} share a sign vector — "
                "cross-replica embeddings would be identical"
            )


def test_sign_rows_balanced_and_orthogonalish():
    dim = 128
    for r in range(1, 32):
        row = _sign_row(r, dim)
        assert set(np.unique(row)) <= {-1.0, 1.0}
        frac = float((row > 0).mean())
        assert 0.25 < frac < 0.75, (r, frac)
    # distinct non-identity replicas should disagree on a healthy
    # fraction of dimensions (decorrelation, not just != somewhere)
    for a in range(1, 8):
        for b in range(a + 1, 8):
            agree = float((_sign_row(a, dim) == _sign_row(b, dim)).mean())
            assert 0.2 < agree < 0.8, (a, b, agree)


def test_sign_row_replica0_identity_preserves_geometry():
    assert np.array_equal(_sign_row(0, 16), np.ones(16, dtype=np.float32))
    # diagonal ±1 transform preserves norms and within-replica dots
    rng = np.random.default_rng(7)
    v = rng.normal(size=(4, 16)).astype(np.float32)
    s = _sign_row(3, 16)
    flipped = v * s
    np.testing.assert_allclose(
        flipped @ flipped.T, v @ v.T, rtol=1e-5, atol=1e-4
    )


@pytest.mark.parametrize(
    "text,r,expected",
    [
        ("hi", 3, "hi~3"),
        ("a b", 2, "a b~2"),
        ("a b c", 1, "a b~1 c"),
        ("a b c d e f", 2, "a b~2 c d~2 e f~2"),
        ("", 5, ""),
        ("anything at all here", 0, "anything at all here"),
    ],
)
def test_perturb_text_tags_every_doc(text, r, expected):
    assert _perturb_text(text, r) == expected


def test_perturb_text_replicas_pairwise_distinct_even_short_docs():
    for text in ("x", "two words", "three token doc", "a much longer doc here"):
        seen = {_perturb_text(text, r) for r in range(6)}
        assert len(seen) == 6, text


def test_perturb_text_cross_replica_wordset_jaccard_below_half():
    """The v3 contract the v2 generator broke: cross-replica copies of
    one doc must FAIL the word-set near-dup threshold (Jaccard >= 0.5),
    else the tiled corpus grows word-set pairs quadratically in the
    factor (measured r13 at x30: 87% of dedup_ngram_jaccard's pairs
    were cross-replica, mean J 0.533 — v2's every-3rd-token tagging
    left J at exactly (2n/3)/(4n/3) = 0.5)."""
    for text in (
        "the quick brown fox jumps over the lazy dog today",
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four",
    ):
        a = set(_perturb_text(text, 0).split(" "))
        for r in (1, 2, 5):
            b = set(_perturb_text(text, r).split(" "))
            j = len(a & b) / len(a | b)
            assert j < 0.5, (text, r, j)


def test_perturb_text_tags_the_jaccard_block_key():
    """dedup_ngram_jaccard blocks on lang + the FIRST TWO words, so the
    2nd word (index 1) must differ across replicas or every block's
    membership grows with the tile factor (quadratic in-row pair
    expansion, blocks past BUCKET_CAP silently dropped)."""
    text = "common prefix follows with more words"
    keys = {
        " ".join(_perturb_text(text, r).split(" ")[:2]) for r in range(6)
    }
    assert len(keys) == 6

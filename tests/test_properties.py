"""Hypothesis property tests for the pure-Python shared cores whose
claims the Spark plans lean on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from flinkproj_spark.operators.multimodal import (
    PHASH_BAND_BITS,
    PHASH_BANDS,
    PHASH_BITS,
    PHASH_MAX_HAMMING,
    phash60,
)


def _bands(x: int) -> list[int]:
    """The same 4×15-bit split phash_band_rows compiles into Spark
    columns — mirrored here so the pigeonhole claim is checked against
    the constants the product actually uses."""
    mask = (1 << PHASH_BAND_BITS) - 1
    return [(x >> (i * PHASH_BAND_BITS)) & mask for i in range(PHASH_BANDS)]


@settings(max_examples=300)
@given(
    st.integers(0, 2**PHASH_BITS - 1),
    st.sets(st.integers(0, PHASH_BITS - 1), max_size=PHASH_MAX_HAMMING),
)
def test_phash_banding_pigeonhole_complete(h, flips):
    """The recall-completeness theorem dedup_phash_hamming and
    stream_phash_gate rest on: ANY hash within PHASH_MAX_HAMMING
    flipped bits shares at least one intact band with the original —
    so the banded equi-join can never miss a qualifying pair."""
    h2 = h
    for b in flips:
        h2 ^= 1 << b
    assert any(a == b for a, b in zip(_bands(h), _bands(h2)))
    assert bin(h ^ h2).count("1") == len(flips)


@settings(max_examples=300)
@given(st.binary(max_size=3 * PHASH_BITS))
def test_phash60_matches_gradient_reference(pix):
    """phash60 (the single hashing core shared by the batch Arrow
    stage and the streaming gate) equals the gradient definition
    bit-for-bit, and declines payloads too short to hash."""
    h = phash60(b"P5 8 8 255\n" + pix)
    if len(pix) < PHASH_BITS + 1:
        assert h is None
    else:
        ref = sum(1 << k for k in range(PHASH_BITS) if pix[k] < pix[k + 1])
        assert h == ref

"""Property-based tests (hypothesis) for the pure-function kernels.

These cover the invariants the example-based tests can't sweep: the BMP
and WAV codecs must round-trip EVERY geometry (odd widths exercise the
4-byte row padding), and SimHash's 4x15-bit banding must find every
signature pair within the hamming<=3 design threshold (the pigeonhole
guarantee dedup_simhash's banded join relies on for exactness).
No SparkSession needed — these run in milliseconds.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_ml_helper_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
    encode_wav,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 17),
    h=st.integers(1, 13),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_any_geometry(w, h, seed):
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    dh, dw, dc, arr = decode_image(encode_bmp(pix))
    assert (dh, dw, dc) == (h, w, 3)
    assert np.array_equal(arr, pix)


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 512),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_length(n, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, size=n).astype(np.int16)
    got_rate, got = decode_audio(encode_wav(samples, rate=rate))
    assert got_rate == rate
    assert np.array_equal(got, samples)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 17),
    h=st.integers(1, 13),
    base=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_geometry_any_filter(w, h, base, seed):
    # the rotating per-row filter sweeps all five spec filters
    # (None/Sub/Up/Average/Paeth) across hypothesis examples, including
    # rows where left/up neighbors are the spec's zero phantom pixels
    rng = np.random.default_rng(seed)
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    png = encode_png(pix, filter_for_row=lambda r: (base + r) % 5)
    dh, dw, dc, arr = decode_png(png)
    assert (dh, dw, dc) == (h, w, 3)
    assert np.array_equal(arr, pix)


def _bands(sig: int) -> list[int]:
    return [(sig >> (k * 15)) & (2**15 - 1) for k in range(4)]


@settings(max_examples=200, deadline=None)
@given(
    sig=st.integers(0, 2**60 - 1),
    flip=st.lists(st.integers(0, 59), min_size=0, max_size=3, unique=True),
)
def test_simhash_banding_is_exact_at_design_threshold(sig, flip):
    # flip <=3 bits: pigeonhole says at least one of the 4 bands is
    # untouched, so the banded equi-join MUST surface the pair
    other = sig
    for b in flip:
        other ^= 1 << b
    hamming = bin(sig ^ other).count("1")
    assert hamming <= 3
    assert any(a == b for a, b in zip(_bands(sig), _bands(other)))


@settings(max_examples=200, deadline=None)
@given(
    sig=st.integers(0, 2**60 - 1),
    flips=st.sets(st.integers(0, 59), min_size=4, max_size=60),
)
def test_simhash_banding_never_false_negative_claim_is_tight(sig, flips):
    # beyond the threshold the guarantee legitimately lapses ONLY when
    # the flips cover all four bands — the boundary the docstring states
    other = sig
    for b in flips:
        other ^= 1 << b
    touched = {b // 15 for b in flips}
    if len(touched) < 4:
        assert any(a == b for a, b in zip(_bands(sig), _bands(other)))

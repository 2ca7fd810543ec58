"""Round-15 VERDICT item 6: composed codec-pipeline fuzz across the
FULL mode matrix.

Round 14 fuzzed the two entropy coders in isolation; this sweeps the
composition: IFV (3 entropy × 2 transform) and MDCT (3 entropy ×
2 alloc) pipelines, asserting for every combination that

- encode→decode roundtrips within the mode's error bound, and
- encode→BIT-FLIP→decode either raises ValueError (the loud contract
  the errors='coerce' Spark path catches) or decodes to
  structurally valid output (right frame count/shape/dtype — a flip
  that lands in pixel payload may legitimately decode to different
  pixels; what must NEVER happen is a non-ValueError exception, a
  hang, or malformed shapes).

Hypothesis drives content, mode choice, and flip position, so the
corners are not hand-picked (the round-14 edge tests pin hand-picked
corners only).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdatabowl2024_25_spark.operators.media_av import (
    decode_avi_ifv,
    decode_wav_mdct,
    encode_avi_ifv,
    encode_wav_mdct,
)

_ENTROPIES = ("zlib", "huffman", "range")


def _frames(seed: int, n: int, h: int, w: int) -> list[np.ndarray]:
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    out = [base]
    for i in range(1, n):
        nxt = np.roll(out[-1], rng.integers(-2, 3), axis=1).copy()
        # sprinkle fresh content so residuals are non-trivial
        nxt[rng.integers(0, h), rng.integers(0, w)] = rng.integers(
            0, 256, 3
        )
        out.append(nxt)
    return out


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**20),
    entropy=st.sampled_from(_ENTROPIES),
    transform=st.booleans(),
    n=st.integers(1, 5),
    gop=st.integers(1, 4),
    q=st.integers(2, 24),
    flip=st.integers(0, 2**24),
)
def test_ifv_matrix_roundtrip_and_bitflip(
    seed, entropy, transform, n, gop, q, flip
):
    frames = _frames(seed, n, 16, 24)
    enc = encode_avi_ifv(
        frames, fps=10, q=q, gop=gop, search=2,
        transform=transform, entropy=entropy,
    )
    dec, fps = decode_avi_ifv(enc)
    assert fps == 10 and len(dec) == n
    bound = q // 2 + 1 if not transform else None
    for a, b in zip(frames, dec):
        assert b.shape == a.shape and b.dtype == np.uint8
        if bound is not None:
            err = np.abs(a.astype(np.int16) - b.astype(np.int16))
            # P-frame error compounds through motion compensation of
            # already-quantized references only via NEW residuals,
            # which the closed loop re-corrects: per-frame bound holds
            assert int(err.max()) <= bound
    # single bit flip anywhere in the container: ValueError or a
    # structurally valid decode — never another exception type
    mut = bytearray(enc)
    pos = flip % len(mut)
    mut[pos] ^= 1 << (flip % 8)
    try:
        dec2, fps2 = decode_avi_ifv(bytes(mut))
    except ValueError:
        return
    assert isinstance(fps2, int) and fps2 >= 0
    for f in dec2:
        assert f.dtype == np.uint8 and f.ndim == 3 and f.shape[2] == 3


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**20),
    entropy=st.sampled_from(_ENTROPIES),
    alloc=st.sampled_from(("uniform", "psy")),
    n=st.integers(16, 1500),
    qbits=st.sampled_from((6, 8, 10)),
    flip=st.integers(0, 2**24),
)
def test_mdct_matrix_roundtrip_and_bitflip(
    seed, entropy, alloc, n, qbits, flip
):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    tone = 6000 * np.sin(2 * np.pi * t * (1 + seed % 40) / 256.0)
    noise = rng.normal(0, 300, n)
    samples = np.clip(tone + noise, -32768, 32767).astype(np.int16)
    enc = encode_wav_mdct(
        samples, sample_rate=8000, frame=64, qbits=qbits,
        entropy=entropy, alloc=alloc,
    )
    dec, sr = decode_wav_mdct(enc)
    assert sr == 8000 and dec.dtype == np.int16 and len(dec) == n
    # lossy but sane: quantization noise, not garbage (SNR > 6 dB on
    # tone-dominated content at qbits>=6)
    sig = float(np.mean(samples.astype(np.float64) ** 2)) + 1e-9
    err = float(
        np.mean((samples.astype(np.float64) - dec.astype(np.float64)) ** 2)
    ) + 1e-9
    assert sig / err > 4.0
    mut = bytearray(enc)
    pos = flip % len(mut)
    mut[pos] ^= 1 << (flip % 8)
    try:
        dec2, sr2 = decode_wav_mdct(bytes(mut))
    except ValueError:
        return
    assert dec2.dtype == np.int16 and dec2.ndim == 1
    assert isinstance(sr2, int) and sr2 >= 0


@pytest.mark.parametrize("entropy", _ENTROPIES)
@pytest.mark.parametrize("transform", [False, True])
def test_ifv_truncation_sweep(entropy, transform):
    """Every strict prefix of a valid container raises ValueError —
    truncation can never hang or produce frames from thin air."""
    enc = encode_avi_ifv(
        _frames(7, 3, 8, 8), fps=4, q=4, gop=2,
        transform=transform, entropy=entropy,
    )
    for cut in range(0, len(enc), max(1, len(enc) // 37)):
        try:
            frames, _ = decode_avi_ifv(enc[:cut])
        except ValueError:
            continue
        for f in frames:  # headerless prefixes may decode 0 frames
            assert f.dtype == np.uint8 and f.shape[2] == 3

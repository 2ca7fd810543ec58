"""Context-adaptive binary range coder (round 14): exact roundtrips
over degenerate and adversarial byte streams, determinism, the
malformed-block guard contract, compression sanity vs zlib on the
payload classes the codecs produce, and the codec integrations
(entropy='range' decodes identically to zlib/huffman in IFV and
MDCT)."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from bigdatabowl2024_25_spark.operators.range_coder import (
    rc_decode_bytes,
    rc_encode_bytes,
)


def test_roundtrip_byte_streams():
    rng = np.random.default_rng(0)
    cases = [
        b"",
        b"\x00",
        b"\xff" * 257,
        bytes(rng.integers(0, 256, 10_000).astype(np.uint8)),
        bytes(rng.integers(0, 40, 30_000).astype(np.uint8)),
        bytes(
            np.clip(rng.normal(0, 3, 20_000), -127, 127)
            .astype(np.int8).view(np.uint8)
        ),
        bytes(range(256)) * 4,
    ]
    for i, raw in enumerate(cases):
        enc = rc_encode_bytes(raw)
        assert rc_decode_bytes(enc, len(raw)) == raw, i
        assert enc == rc_encode_bytes(raw), i  # deterministic


def test_beats_zlib_on_residual_like_streams():
    """On iid residual-shaped data (small signed values, no LZ
    repeats) the adaptive model outperforms zlib's static-huffman
    stage — the reason CABAC replaced VLC tables."""
    rng = np.random.default_rng(1)
    resid = bytes(
        np.clip(rng.normal(0, 3, 20_000), -127, 127)
        .astype(np.int8).view(np.uint8)
    )
    assert len(rc_encode_bytes(resid)) < len(zlib.compress(resid, 6))
    skew = bytes(
        (rng.geometric(0.2, 20_000) - 1).clip(0, 255).astype(np.uint8)
    )
    assert len(rc_encode_bytes(skew)) < len(zlib.compress(skew, 6))


def test_corrupt_block_guards():
    enc = rc_encode_bytes(b"hello world payload")
    n = 19
    with pytest.raises(ValueError, match="truncated"):
        rc_decode_bytes(enc[:3], n)
    with pytest.raises(ValueError, match="exhausted|truncated"):
        rc_decode_bytes(enc[:8], n)
    with pytest.raises(ValueError, match="size mismatch"):
        rc_decode_bytes(enc, n + 1)
    with pytest.raises(ValueError, match="size mismatch"):
        rc_decode_bytes(b"\x00\x00\x00\x00" + enc[4:], n)
    bad = bytearray(enc)
    bad[4] = 7  # preamble byte must be 0
    with pytest.raises(ValueError, match="preamble"):
        rc_decode_bytes(bytes(bad), n)


def test_ifv_range_mode_decodes_identically():
    from bigdatabowl2024_25_spark.operators.media_av import (
        decode_avi_ifv,
        encode_avi_ifv,
        sample_ifv_frames,
    )

    rng = np.random.default_rng(2)
    frames = [
        rng.integers(0, 256, (18, 25, 3)).astype(np.uint8)
        for _ in range(6)
    ]
    for transform in (False, True):
        pz = encode_avi_ifv(frames, fps=5, q=6, gop=3,
                            transform=transform)
        pr = encode_avi_ifv(frames, fps=5, q=6, gop=3,
                            transform=transform, entropy="range")
        oz, _ = decode_avi_ifv(pz)
        orr, fps = decode_avi_ifv(pr)
        assert fps == 5
        assert all((a == b).all() for a, b in zip(oz, orr))
        got = sample_ifv_frames(pr, 2)
        assert all((g == w).all() for g, w in zip(got, orr[::2]))
    # forged frame entropy byte past the registry must raise
    i_pos = pr.index(b"00dc") + 8
    bad = bytearray(pr)
    assert bad[i_pos:i_pos + 1] == b"I"
    bad[i_pos + 1] = 9
    with pytest.raises(ValueError, match="entropy mode"):
        decode_avi_ifv(bytes(bad))


def test_mdct_range_mode_decodes_identically():
    from bigdatabowl2024_25_spark.operators.media_av import (
        decode_wav_mdct,
        encode_wav_mdct,
        mdct_info,
    )

    rng = np.random.default_rng(3)
    n, rate = 2000, 16_000
    t = np.arange(n) / rate
    x = (
        15_000 * np.sin(2 * np.pi * 440 * t)
        + 500 * rng.standard_normal(n)
    ).astype(np.int16)
    for alloc in ("uniform", "psy"):
        yz, _ = decode_wav_mdct(
            encode_wav_mdct(x, rate, qbits=6, alloc=alloc)
        )
        pr = encode_wav_mdct(x, rate, qbits=6, alloc=alloc,
                             entropy="range")
        yr, _ = decode_wav_mdct(pr)
        assert (yz == yr).all()
        info = mdct_info(pr)
        assert info["entropy"] == "range" and info["alloc"] == alloc
    # forged flags naming huffman AND range together must raise
    import struct as _s

    bad = bytearray(pr)
    fpos = bad.index(b"fmt ") + 8
    flags_off = fpos + 22
    (flags,) = _s.unpack_from("<H", bad, flags_off)
    _s.pack_into("<H", bad, flags_off, flags | 1)
    with pytest.raises(ValueError, match="flags"):
        mdct_info(bytes(bad))
    # silence through the range stage
    z = np.zeros(300, dtype=np.int16)
    y, _ = decode_wav_mdct(encode_wav_mdct(z, rate, entropy="range"))
    assert (y == 0).all()


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=800))
def test_range_roundtrip_hypothesis(raw):
    assert rc_decode_bytes(rc_encode_bytes(raw), len(raw)) == raw


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=6, max_size=200), st.integers(0, 199))
def test_range_bitflip_never_silently_wrong(raw, pos):
    """Any single bit flip in the coded stream either still decodes
    (to the SAME length — size is enforced by the header) or raises
    ValueError; it must never return bytes of the wrong length or
    crash with a non-ValueError."""
    enc = bytearray(rc_encode_bytes(raw))
    enc[4 + pos % max(1, len(enc) - 4)] ^= 1 << (pos % 8)
    try:
        out = rc_decode_bytes(bytes(enc), len(raw))
        assert len(out) == len(raw)
    except ValueError:
        pass

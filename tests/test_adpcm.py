"""IMA ADPCM (WAV format 0x0011): the round-12 compressed-audio
codec — roundtrip fidelity, 4:1 compression, cross-check against
CPython's audioop DVI-ADPCM core, determinism, corrupt-payload
guards."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bigdatabowl2024_25_spark.operators.media_av import (
    decode_wav_ima_adpcm,
    encode_wav_ima_adpcm,
)


def _signal(n=8000, rate=16000):
    t = np.arange(n) / rate
    x = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(
        2 * np.pi * 1330 * t + 0.5
    )
    return (x * 20000).astype(np.int16)


def test_roundtrip_snr_and_ratio():
    x = _signal()
    payload = encode_wav_ima_adpcm(x, 16000)
    y, rate = decode_wav_ima_adpcm(payload)
    assert rate == 16000
    assert len(y) == len(x)
    err = x.astype(np.float64) - y.astype(np.float64)
    snr = 10 * np.log10(
        np.mean(x.astype(np.float64) ** 2) / max(np.mean(err**2), 1e-9)
    )
    assert snr > 20.0, snr  # ADPCM on tonal content: typically ~30 dB
    # ~4:1 vs 16-bit PCM (4 bits/sample + block/container headers)
    assert len(payload) < len(x) * 2 * 0.3
    # determinism: same samples -> same bytes
    assert encode_wav_ima_adpcm(x, 16000) == payload


def test_block_boundary_state_carry():
    """The step index carries across blocks (each header snapshots
    it): a signal longer than one block must decode with no seam —
    identical to encoding the same samples with a larger block size."""
    x = _signal(n=5000)
    small = decode_wav_ima_adpcm(encode_wav_ima_adpcm(x, 16000, 256))[0]
    big = decode_wav_ima_adpcm(encode_wav_ima_adpcm(x, 16000, 4096))[0]
    # both are faithful: the first sample of every block is verbatim,
    # so differences stay within quantization error of each other
    err = small.astype(np.float64) - big.astype(np.float64)
    snr = 10 * np.log10(
        np.mean(x.astype(np.float64) ** 2) / max(np.mean(err**2), 1e-9)
    )
    assert snr > 20.0
    # first sample of block 2 is verbatim for block_align=256
    spb = (256 - 4) * 2 + 1
    assert small[spb] == x[spb]


def test_core_matches_audioop_reference():
    """Cross-check the nibble recurrence against CPython's audioop
    (the DVI/IMA ADPCM reference in the stdlib through 3.12): seeding
    audioop with (first_sample, 0) state must reproduce our stream's
    remaining nibbles exactly."""
    audioop = pytest.importorskip("audioop")  # removed in 3.13
    x = _signal(n=401)
    payload = encode_wav_ima_adpcm(x, 16000, block_align=1024)
    # our data chunk: find it and strip the 4-byte header
    i = payload.index(b"data")
    (size,) = struct.unpack_from("<I", payload, i + 4)
    block = payload[i + 8:i + 8 + size]
    ours = []
    for byte in block[4:]:
        ours += [byte & 0x0F, byte >> 4]
    ours = ours[: len(x) - 1]  # drop pad nibbles
    ref_bytes, _state = audioop.lin2adpcm(
        x[1:].tobytes(), 2, (int(x[0]), 0)
    )
    ref = []
    for byte in ref_bytes:
        ref += [byte >> 4, byte & 0x0F]  # audioop packs high-first
    ref = ref[: len(x) - 1]
    assert ours == ref


def test_corrupt_payload_guards():
    x = _signal(n=100)
    good = encode_wav_ima_adpcm(x, 16000)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_ima_adpcm(b"nonsense")
    with pytest.raises(ValueError, match="IMA"):
        # PCM wav is not ADPCM
        from bigdatabowl2024_25_spark.operators.media_av import encode_wav
        decode_wav_ima_adpcm(encode_wav(x, 16000))
    with pytest.raises(ValueError, match="int16"):
        encode_wav_ima_adpcm(x.astype(np.float32), 16000)
    with pytest.raises(ValueError, match="mono"):
        encode_wav_ima_adpcm(np.stack([x, x], axis=1), 16000)
    with pytest.raises(ValueError, match="block_align"):
        # spb <= 1: the block loop would silently emit nothing
        encode_wav_ima_adpcm(x, 16000, block_align=4)
    # the smallest legal block still roundtrips (3 samples/block)
    y5, _ = decode_wav_ima_adpcm(encode_wav_ima_adpcm(x, 16000, 5))
    assert len(y5) == len(x) and y5[0] == x[0]
    # fact count beyond data
    bad = bytearray(good)
    i = bad.index(b"fact")
    struct.pack_into("<I", bad, i + 8, 10**6)
    with pytest.raises(ValueError, match="fact count"):
        decode_wav_ima_adpcm(bytes(bad))


def test_factless_file_bounded_by_block_structure():
    """ADVICE r12: a third-party IMA file without a 'fact' chunk
    (legal, if non-conforming) must still decode bounded by the
    data-chunk length — at most ONE spurious trailing sample (the
    final block's pad nibble), never unbounded padding, and the
    prefix must be bit-identical to the fact-trimmed decode."""
    for n in (100, 101, 2041, 2042):  # even/odd nibble counts + spb edges
        x = _signal(n=n)
        good = encode_wav_ima_adpcm(x, 16000)
        exact, _ = decode_wav_ima_adpcm(good)
        assert len(exact) == n
        # excise the 12-byte fact chunk (8-byte header + 4-byte count)
        i = good.index(b"fact")
        factless = good[:i] + good[i + 12:]
        # RIFF size field must stay consistent with the new length
        factless = (
            b"RIFF"
            + struct.pack("<I", len(factless) - 8)
            + factless[8:]
        )
        y, rate = decode_wav_ima_adpcm(factless)
        assert rate == 16000
        assert n <= len(y) <= n + 1  # pad-nibble ambiguity only
        assert np.array_equal(y[:n], exact)


def test_exact_block_boundary_counts():
    """Round 13 edge audit: n_samples exactly == samples_per_block
    (one perfectly full block, even nibble count, no pad), == spb ± 1
    (pad nibble / one-sample spill into a new block), and the minimum
    legal block_align=5 (spb=3) at its own boundaries — every count
    decodes exactly and the byte layout matches the block formula."""
    for ba in (5, 32):
        spb = (ba - 4) * 2 + 1
        for n in (spb - 1, spb, spb + 1, 2 * spb, 2 * spb + 1):
            x = _signal(n=n)
            p = encode_wav_ima_adpcm(x, 16000, block_align=ba)
            y, rate = decode_wav_ima_adpcm(p)
            assert rate == 16000 and len(y) == n
            assert y[0] == x[0]  # header carries it verbatim
            # data-chunk length follows the block structure exactly:
            # full blocks are block_align bytes; the tail block is
            # 4 + ceil((n_tail - 1) / 2) bytes
            i = p.index(b"data")
            (dlen,) = struct.unpack_from("<I", p, i + 4)
            full, tail = divmod(n, spb)
            want = full * ba + (4 + (tail - 1 + 1) // 2 if tail else 0)
            assert dlen == want, (ba, n, dlen, want)

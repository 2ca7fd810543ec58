"""Audio energy-delta fingerprint: reference parity, invariances,
WAV decode path, and funnel reuse.

Parity query: q94 'afp64'/'afp' branches re-derive fingerprints and
the banded Hamming funnel from formula PCM in DuckDB SQL.
"""

from __future__ import annotations

import numpy as np
import pytest

from bigdatabowl2024_25_spark.operators.audio_fp import (
    audio_fingerprint64,
    fingerprint_audio,
)
from bigdatabowl2024_25_spark.operators.media_av import encode_wav
from bigdatabowl2024_25_spark.operators.phash import phash_near_dup


def ref_fp(x: list[int], n_blocks: int = 32) -> int:
    n = len(x)
    nb = n_blocks + 1
    lo = [abs(v) for v in x]
    hi = [0] + [abs(x[i] - x[i - 1]) for i in range(1, n)]
    fp = 0
    for base, band in ((0, lo), (32, hi)):
        sums = [0] * nb
        for i, v in enumerate(band):
            sums[i * nb // n] += v
        for k in range(n_blocks):
            if sums[k + 1] > sums[k]:
                fp |= 1 << (base + k)
    return fp - (1 << 64) if fp >= 1 << 63 else fp


def _clip(seed: int, n: int = 160) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(-3000, 3000, size=n).astype(np.int16)


def test_matches_python_reference():
    for seed in range(5):
        x = _clip(seed, 100 + seed * 37)
        assert audio_fingerprint64(x) == ref_fp([int(v) for v in x])


def test_volume_invariance_and_noise_robustness():
    x = _clip(1)
    assert audio_fingerprint64(x * 4) == audio_fingerprint64(x)
    # flipping one sample slightly changes few bits, not most
    y = x.copy()
    y[50] += 30
    d = audio_fingerprint64(x) ^ audio_fingerprint64(y)
    assert bin(d & ((1 << 64) - 1)).count("1") <= 6


def test_multichannel_fold_is_exact_sum():
    a, b = _clip(2), _clip(3)
    stereo = np.stack([a, b], axis=1)
    assert audio_fingerprint64(stereo) == audio_fingerprint64(
        a.astype(np.int64) + b.astype(np.int64)
    )


def test_short_clip_raises():
    with pytest.raises(ValueError, match="too short"):
        audio_fingerprint64(np.arange(10))


def test_wav_decode_path_and_funnel_reuse(spark):
    rows = []
    for d in range(8):
        x = _clip(d % 4)  # 0-3 unique; 4-7 exact twins of 0-3
        rows.append((d, bytearray(encode_wav(x, 8000))))
    rows.append((99, None))  # NULL payload: no row
    rows.append((98, bytearray(encode_wav(_clip(9, 20)))))  # too short
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    fp = fingerprint_audio(df)
    got = {r.media_id: r.afp for r in fp.collect()}
    assert set(got) == set(range(8))
    for d in range(4):
        assert got[d] == got[d + 4] == ref_fp([int(v) for v in _clip(d)])
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_dup(fp, hash_col="afp", max_hamming=0).collect()
    }
    assert set(pairs) == {(d, d + 4) for d in range(4)}
    assert all(h == 0 for h in pairs.values())

"""Audio fingerprinting — the audio leg of the multimodal dedup story.

Rounds 8-9 gave the engine image near-dup (`phash.py`: dHash + LSH
bands + Hamming verify); audio clips deserve the same pass — a crawl
carries re-encoded / volume-normalized copies of identical clips, and
whole-file hashing misses every one of them.

Algorithm: a 64-bit **temporal energy-delta fingerprint** in the
Haitsma-Kalker family ("A Highly Robust Audio Fingerprinting System",
ISMIR 2002 — their fingerprint is the sign of band-energy differences;
ours keeps the sign-of-differences core with two FFT-free bands, since
this environment has no DSP library and determinism is the contract):

1. fold channels by exact integer sum;
2. band 0 = |x_i| (amplitude), band 1 = |x_i − x_{i−1}| (first
   difference — a high-frequency-energy proxy);
3. each band's samples split into 33 blocks (block of sample i is
   ``i·33 div n`` — same floor arithmetic any SQL engine reproduces),
   block energies as exact int64 sums;
4. bit k = E(block k+1) > E(block k), 32 bits per band, packed into
   one signed int64 (band 0 → bits 0-31, band 1 → bits 32-63, bit 63
   two's-complement like `phash.dhash64`).

Sign-of-delta is invariant to uniform volume scaling (both sides of
every comparison scale together) and robust to small noise (each bit
pools ~n/33 samples) — exactly the re-encode/re-normalize family of
near-duplicates.

Spark shape (identical to the image leg, by construction):
- decode + fingerprint is ONE `mapInPandas` pass (Python only because
  the WAV decoder is); payloads never shuffle — the 8-byte
  fingerprint does.
- candidates / verify / survivors REUSE `phash.phash_near_dup`,
  `phash.incremental_phash_candidates` and `phash.phash_survivors`
  verbatim — they are generic over (id, 64-bit hash), so the whole
  banded-LSH / bit_count(xor) / connected-components funnel and its
  daily-crawl incremental twin serve audio unchanged.

Driver verification: q94's 'afp64'/'afp' branches re-derive the
fingerprints and the banded candidate/Hamming funnel from
formula-generated PCM in DuckDB SQL (see suite/multimodal_q.py);
multichannel fold, volume invariance, and WAV roundtrip stay
pytest-side (tests/test_audio_fp.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


N_BLOCKS = 32


def audio_fingerprint64(samples: np.ndarray, n_blocks: int = N_BLOCKS) -> int:
    """64-bit two-band energy-delta fingerprint of an integer PCM
    array (1-D mono or 2-D (n, channels)). Exact integer arithmetic
    throughout; requires n ≥ n_blocks+1 samples (shorter clips carry
    too little structure to fingerprint — callers should length-filter
    first, mirroring the text pipeline's min_tokens)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 2:
        x = x.sum(axis=1)
    n = x.shape[0]
    nb = n_blocks + 1
    if n < nb:
        raise ValueError(f"clip too short to fingerprint: {n} < {nb}")
    lo = np.abs(x)
    hi = np.abs(np.diff(x, prepend=x[:1]))
    block = np.arange(n, dtype=np.int64) * nb // n
    fp = 0
    for base, band in ((0, lo), (32, hi)):
        sums = np.bincount(block, weights=band.astype(np.float64), minlength=nb)
        # bincount returns float64; exact for |sums| < 2^53 — a block
        # would need >2^37 max-amplitude int16 samples to break that.
        e = sums.astype(np.int64)
        for k in range(n_blocks):
            if e[k + 1] > e[k]:
                fp |= 1 << (base + k)
    # two's-complement signed int64, portable to any BIGINT engine
    if fp >= 1 << 63:
        fp -= 1 << 64
    return fp


def fingerprint_audio(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_blocks: int = N_BLOCKS,
) -> DataFrame:
    """(id, afp) for a binary WAV column — decode + fingerprint in one
    mapInPandas pass, the exact shape of `phash.dhash_images`. NULL
    payloads and too-short clips emit no row (the length filter a
    production pipeline applies upstream)."""
    from .media_av import decode_wav

    schema = f"{id_col} long, afp long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fps = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                pcm, _rate = decode_wav(bytes(payload))
                if pcm.shape[0] < n_blocks + 1:
                    continue
                ids.append(int(mid))
                fps.append(audio_fingerprint64(pcm, n_blocks))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "afp": pd.Series(fps, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=schema)

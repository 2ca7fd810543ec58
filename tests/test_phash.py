"""Perceptual-hash image near-dup (`operators.phash`): the numpy
kernel against a from-the-definition reference, the resize pooling,
and end-to-end recall on planted near-duplicate PNGs through the real
encode → decode → dhash → LSH-band → Hamming pipeline.

The q94 'dhash64'/'dhash' branches value-hash the identity-resize
path against a DuckDB pixel-formula re-derivation; these tests cover
what SQL can't reach — the area-average resize and the robustness
properties (brightness invariance, noise tolerance) that make dHash a
NEAR-dup hash rather than an exact one.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.phash import (
    area_resize,
    dhash64,
    gray_f64,
)


def ref_dhash(img: np.ndarray, hs: int = 8) -> int:
    """Independent reference: explicit loops, int arithmetic."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=-1)
    h, w = a.shape
    pooled = np.zeros((hs, hs + 1))
    for oy in range(hs):
        for ox in range(hs + 1):
            y0, y1 = oy * h // hs, (oy + 1) * h // hs
            x0, x1 = ox * w // (hs + 1), (ox + 1) * w // (hs + 1)
            pooled[oy, ox] = a[y0:y1, x0:x1].mean()
    acc = 0
    for y in range(hs):
        for x in range(hs):
            if pooled[y, x + 1] > pooled[y, x]:
                acc |= 1 << (y * hs + x)
    return acc - (1 << 64) if acc >= 1 << 63 else acc


def _rand_img(rng, h, w, c=3):
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def test_dhash_matches_reference_and_is_signed64():
    rng = np.random.default_rng(7)
    for h, w, c in [(8, 9, 1), (8, 9, 3), (16, 18, 3), (37, 53, 3), (64, 56, 1)]:
        img = _rand_img(rng, h, w, c)
        got = dhash64(img)
        assert got == ref_dhash(img)
        assert -(1 << 63) <= got < (1 << 63)


def test_area_resize_identity_and_blocks():
    rng = np.random.default_rng(3)
    a = rng.random((8, 9))
    assert np.array_equal(area_resize(a, 8, 9), a)
    b = rng.random((16, 18))
    out = area_resize(b, 8, 9)
    assert out.shape == (8, 9)
    assert np.allclose(out[0, 0], b[0:2, 0:2].mean())
    assert np.allclose(out[7, 8], b[14:16, 16:18].mean())
    import pytest

    with pytest.raises(ValueError, match="smaller"):
        area_resize(a, 16, 18)


def test_brightness_shift_invariance():
    """dHash compares ADJACENT pooled values, so a uniform brightness
    shift (no clipping) never flips a bit — the re-encode/levels-tweak
    family of near-dups hashes identically."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 200, size=(32, 36, 3), dtype=np.uint8)
    assert dhash64(img) == dhash64(img + np.uint8(40))


def test_small_noise_low_hamming():
    """Flipping a few pixels by ±1 moves each pooled mean by ≪ the
    typical adjacent difference: the hash moves ≤ a few bits."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(64, 72, 1), dtype=np.uint8)
    noisy = img.astype(np.int16)
    for _ in range(20):
        y, x = rng.integers(0, 64), rng.integers(0, 72)
        noisy[y, x, 0] += rng.choice([-1, 1])
    noisy = noisy.clip(0, 255).astype(np.uint8)
    ham = bin((dhash64(img) ^ dhash64(noisy)) & ((1 << 64) - 1)).count("1")
    assert ham <= 6


def test_end_to_end_recall_through_real_png(spark):
    """The full funnel over real bytes: 20 distinct random 64×56
    images + a brightness-shifted clone of each (ids +1000), encoded
    to PNG, decoded and hashed by dhash_images, banded and verified by
    phash_near_dup. Every planted (i, i+1000) pair must be recalled at
    Hamming 0; survivors keep exactly one per cluster."""
    import pandas as pd
    from bigdatabowl2024_25_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
    )
    from bigdatabowl2024_25_spark.operators.phash import (
        dhash_images,
        phash_near_dup,
        phash_survivors,
    )

    rng = np.random.default_rng(42)
    rows = []
    for i in range(20):
        img = rng.integers(0, 200, size=(64, 56, 3), dtype=np.uint8)
        rows.append((i, encode_png(img)))
        rows.append((i + 1000, encode_png(img + np.uint8(30))))
    pdf = pd.DataFrame(
        {
            "media_id": [r[0] for r in rows],
            "media_type": "image",
            "payload": [r[1] for r in rows],
            "source": "t",
        }
    )
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    hashes = dhash_images(media, id_col="media_id", codec="png")
    pairs = phash_near_dup(hashes, id_col="media_id", max_hamming=6)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    for i in range(20):
        assert got.get((i, i + 1000)) == 0, f"planted pair {i} missed"
    surv = {
        r.media_id
        for r in phash_survivors(media, pairs, "media_id")
        .select("media_id")
        .collect()
    }
    # each planted cluster keeps its min id; chance cross-image
    # collisions can only merge clusters (still ≥1 survivor each)
    assert surv <= set(range(20))
    assert len(surv) >= 1 and 0 in surv or min(surv) < 20


def test_phash_plan_no_python_in_band_join(spark):
    """The banding/verify stages stay JVM-side: hashing is the one
    mapInPandas (decode lives there); the self-join + bit_count carry
    no BatchEvalPython/ArrowEval nodes."""
    import pandas as pd
    from bigdatabowl2024_25_spark.operators.phash import phash_near_dup

    hashes = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2, 3], "dhash": [5, 5, -9]})
    )
    plan = hashes.sparkSession.sparkContext._jvm.PythonSQLUtils.explainString(
        phash_near_dup(hashes)._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_incremental_phash_two_day_replay(spark):
    """The image daily-crawl loop: day-1 hashes become state; day 2's
    exact re-crawl pairs at Hamming 0, a fresh image pairs with
    nothing, a batch-internal twin pair is caught; ghost rule keeps
    dropped newcomers out of tomorrow's state."""
    import pandas as pd
    from bigdatabowl2024_25_spark.operators.phash import (
        incremental_phash_candidates,
    )

    # distinct hashes far apart; twins share a hash exactly
    H = {0: 7, 1: -(1 << 62) + 5, 2: 0x0F0F0F0F0F0F0F0F}
    state = spark.createDataFrame(
        pd.DataFrame({"doc": [0, 1, 2], "dhash": [H[0], H[1], H[2]]})
    )
    day2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [100, 110, 120, 121],
                "dhash": [H[0], 0x123456789ABCDEF, H[2] ^ 3, H[2] ^ 3],
            }
        )
    )
    pairs, new_rows = incremental_phash_candidates(day2, state)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got.get((0, 100)) == 0           # re-crawl vs history
    assert got.get((120, 121)) == 0         # batch-internal twins
    assert got.get((2, 120)) == 2 and got.get((2, 121)) == 2  # near
    assert not any(110 in p for p in got)   # fresh image clean
    assert not any(a < 100 and b < 100 for a, b in got)  # no hist x hist
    # every newcomer with a pair drops: 100 (re-crawl of 0), and BOTH
    # twins 120/121 (each within Hamming 2 of history image 2 — the
    # greater-id-loses rule applies per pair, and (2, 120)/(2, 121)
    # out-vote the internal twin pair)
    losers = {b for _a, b in got}
    assert losers == {100, 120, 121}
    kept = new_rows.filter(~F.col("doc").isin(list(losers)))
    assert {r.doc for r in kept.collect()} == {110}


def test_video_near_dup_aligned_frames(spark):
    import numpy as np

    from bigdatabowl2024_25_spark.operators.media_av import encode_avi_mjpeg
    from bigdatabowl2024_25_spark.operators.phash import (
        dhash_video_frames,
        video_near_dup,
    )

    def frames(seed, nf):
        yy, xx = np.mgrid[0:8, 0:9]
        return [
            (((xx * 5 + yy * 3 + seed * 7 + f * 11) % 32) * 8)
            .astype(np.uint8)[..., None]
            .repeat(3, axis=-1)
            for f in range(nf)
        ]

    rows = [
        (0, bytearray(encode_avi_mjpeg(frames(1, 3), fps=5))),
        (1, bytearray(encode_avi_mjpeg(frames(1, 3), fps=5))),  # twin of 0
        (2, bytearray(encode_avi_mjpeg(frames(9, 3), fps=5))),  # unrelated
        # shares only frame 0 with videos 0/1 (then diverges hard)
        (3, bytearray(encode_avi_mjpeg(frames(1, 1) + frames(5, 2)[0:2], fps=5))),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    fh = dhash_video_frames(df)
    got = {(r.media_id, r.frame): r.dhash for r in fh.collect()}
    assert {m for m, _ in got} == {0, 1, 2, 3}
    assert all(got[(0, f)] == got[(1, f)] for f in range(3))

    pairs = {
        (r.id_a, r.id_b): r.n_match
        for r in video_near_dup(
            fh, max_hamming=0, min_matching_frames=2
        ).collect()
    }
    assert pairs == {(0, 1): 3}  # 3 needs >=2 matches: only frame 0 aligns

    # with min_matching_frames=1 the single-frame overlap appears too
    pairs1 = {
        (r.id_a, r.id_b): r.n_match
        for r in video_near_dup(
            fh, max_hamming=0, min_matching_frames=1
        ).collect()
    }
    assert pairs1[(0, 3)] == 1 and pairs1[(1, 3)] == 1


def test_video_frame_sampling_stride(spark):
    import numpy as np

    from bigdatabowl2024_25_spark.operators.media_av import encode_avi_mjpeg
    from bigdatabowl2024_25_spark.operators.phash import dhash_video_frames

    imgs = [
        np.full((8, 9, 3), 30 * f, dtype=np.uint8) for f in range(6)
    ]
    df = spark.createDataFrame(
        [(0, bytearray(encode_avi_mjpeg(imgs, fps=5)))],
        "media_id bigint, payload binary",
    )
    out = dhash_video_frames(df, every_n=3).collect()
    assert len(out) == 2  # frames 0 and 3 only


def test_video_near_dup_shift_tolerant(spark):
    """Round-10 fix: a twin with a trimmed intro (all frames offset by
    a constant) must still match — the round-9 aligned-position join
    was blind to it. The modal offset is reported alongside n_match."""
    import numpy as np

    from bigdatabowl2024_25_spark.operators.media_av import encode_avi_mjpeg
    from bigdatabowl2024_25_spark.operators.phash import (
        dhash_video_frames,
        video_near_dup,
    )

    def frames(seed, fs):
        yy, xx = np.mgrid[0:8, 0:9]
        return [
            (((xx * 5 + yy * 3 + seed * 7 + f * 11) % 32) * 8)
            .astype(np.uint8)[..., None]
            .repeat(3, axis=-1)
            for f in fs
        ]

    rows = [
        (0, bytearray(encode_avi_mjpeg(frames(1, [0, 1, 2, 3]), fps=5))),
        # 1 = video 0 with the first frame trimmed: offsets all +1
        (1, bytearray(encode_avi_mjpeg(frames(1, [1, 2, 3]), fps=5))),
        (2, bytearray(encode_avi_mjpeg(frames(9, [0, 1, 2]), fps=5))),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    fh = dhash_video_frames(df)
    got = {
        (r.id_a, r.id_b): (r.offset, r.n_match)
        for r in video_near_dup(
            fh, max_hamming=0, min_matching_frames=2
        ).collect()
    }
    assert got == {(0, 1): (1, 3)}  # video 0's frame k = video 1's k-1


def test_video_near_dup_collapse_runs_bounds_static_scenes(spark):
    """Two static videos (every frame identical) must contribute ONE
    verified row, not N_a x N_b — the run-collapse pre-step keeps only
    scene changes, bounding the per-pair candidate volume."""
    import pandas as pd

    from bigdatabowl2024_25_spark.operators.phash import video_near_dup

    rows = (
        [(0, f, 12345) for f in range(10)]
        + [(1, f, 12345) for f in range(10)]
    )
    fh = spark.createDataFrame(rows, "media_id bigint, frame long, dhash long")
    got = video_near_dup(
        fh, max_hamming=0, min_matching_frames=1
    ).collect()
    assert [(r.id_a, r.id_b, r.offset, r.n_match) for r in got] == [
        (0, 1, 0, 1)
    ]
    # without the collapse the same input votes 10 offsets, modal n=10
    raw = video_near_dup(
        fh, max_hamming=0, min_matching_frames=1, collapse_runs=False
    ).collect()
    assert raw[0].n_match == 10


def test_incremental_pairs_unique_for_unequal_hash_batch_pairs(spark):
    """Round-10 q94 'dincr' catch: a within-batch pair appears in both
    join orderings, and the old distinct spanned the side-tagged hash
    columns — one duplicate row per unequal-hash in-batch pair (exact
    twins, hamming 0, masked it). Pairs must be unique on (id_a, id_b)."""
    from bigdatabowl2024_25_spark.operators.phash import (
        incremental_phash_candidates,
    )

    state = spark.createDataFrame([], "doc bigint, dhash bigint")
    # two batch docs colliding in band 0 (low 16 bits equal) with
    # DIFFERENT hashes (bit 17 differs -> hamming 1)
    batch = spark.createDataFrame(
        [(1, 7), (2, 7 | (1 << 17))], "media_id bigint, dhash bigint"
    )
    pairs, _rows = incremental_phash_candidates(batch, state)
    got = [(r.id_a, r.id_b, r.hamming) for r in pairs.collect()]
    assert got == [(1, 2, 1)]

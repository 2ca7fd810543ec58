"""IFV inter-frame video (round 13): the motion-compensated codec —
roundtrip error bounds, GOP/closed-loop seam behavior (no drift),
motion-estimation efficiency on pure translation, determinism, and
the corrupt-payload guard contract."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from bigdatabowl2024_25_spark.operators.media_av import (
    decode_avi_ifv,
    encode_avi_ifv,
)


def _scene(n=10, h=37, w=50, seed=0, step=(1, 2)):
    """A textured scene translating by `step` px/frame — the content
    class motion compensation exists for."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + n * abs(step[0]) + 8,
                                 w + n * abs(step[1]) + 8, 3)).astype(
        np.uint8
    )
    return [
        base[i * step[0]: i * step[0] + h, i * step[1]: i * step[1] + w]
        .copy()
        for i in range(n)
    ]


def test_roundtrip_error_bound_and_ratio():
    frames = _scene()
    for q in (2, 6, 16):
        p = encode_avi_ifv(frames, fps=5, q=q, gop=4)
        out, fps = decode_avi_ifv(p)
        assert fps == 5 and len(out) == len(frames)
        bound = q // 2 + 1
        for f, o in zip(frames, out):
            assert o.shape == f.shape and o.dtype == np.uint8
            assert int(np.abs(o.astype(int) - f.astype(int)).max()) <= bound
    # random texture is zlib-incompressible, so beating raw at all on
    # a translating scene is the motion compensation working
    p = encode_avi_ifv(frames, fps=5, q=8, gop=10)
    assert sum(f.nbytes for f in frames) / len(p) > 2.0


def test_iframes_lossless_and_gop_seams():
    """Every I-frame decodes bit-exact; the closed-loop discipline
    keeps the LAST P-frame of each GOP inside the same error bound as
    the first (no drift accumulation across the GOP)."""
    frames = _scene(n=12)
    q, gop = 6, 4
    out, _ = decode_avi_ifv(encode_avi_ifv(frames, fps=5, q=q, gop=gop))
    bound = q // 2 + 1
    for i, (f, o) in enumerate(zip(frames, out)):
        err = int(np.abs(o.astype(int) - f.astype(int)).max())
        if i % gop == 0:
            assert err == 0  # I-frame: zlib, lossless
        else:
            assert err <= bound  # incl. the last frame before a seam


def test_pure_translation_residuals_vanish():
    """When motion is exactly representable (integer translation
    within the search range, interior blocks), the predictor should
    capture it and residuals quantize to ~zero: interior pixels decode
    EXACTLY despite q=16."""
    frames = _scene(n=4, step=(2, 3))
    out, _ = decode_avi_ifv(
        encode_avi_ifv(frames, fps=5, q=16, gop=4, search=4)
    )
    # interior region: exact. The margin grows by the per-frame step —
    # border-clamp mismatch (the only content motion cannot model)
    # drags inward with the scene at step px/frame
    for i, (f, o) in enumerate(zip(frames, out)):
        m = 8 + 3 * i
        assert (o[m:-m, m:-m] == f[m:-m, m:-m]).all()


def test_determinism_and_nonmultiple_dims():
    # 9x13 is far from the 8-px block grid: padding + crop must be
    # transparent, and encoding must be byte-stable
    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 256, (9, 13, 3)).astype(np.uint8)
        for _ in range(5)
    ]
    p1 = encode_avi_ifv(frames, fps=7, q=4, gop=2)
    p2 = encode_avi_ifv(frames, fps=7, q=4, gop=2)
    assert p1 == p2
    out, fps = decode_avi_ifv(p1)
    assert fps == 7 and all(o.shape == (9, 13, 3) for o in out)
    for f, o in zip(frames, out):
        assert int(np.abs(o.astype(int) - f.astype(int)).max()) <= 3


def test_single_frame_and_gop_one():
    f = [_scene(n=1)[0]]
    out, _ = decode_avi_ifv(encode_avi_ifv(f, q=8))
    assert (out[0] == f[0]).all()
    # gop=1: all-I (lossless video, degenerate but legal)
    frames = _scene(n=3)
    out, _ = decode_avi_ifv(encode_avi_ifv(frames, q=8, gop=1))
    assert all((o == f).all() for o, f in zip(out, frames))


def test_corrupt_payload_guards():
    frames = _scene(n=4)
    good = encode_avi_ifv(frames, fps=5, q=6, gop=4)

    with pytest.raises(ValueError, match="RIFF"):
        decode_avi_ifv(b"junk")
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_ifv([])
    with pytest.raises(ValueError, match="q must be"):
        encode_avi_ifv(frames, q=1)
    with pytest.raises(ValueError, match="uint8 RGB"):
        encode_avi_ifv([frames[0].astype(np.float32)])
    with pytest.raises(ValueError, match="share dimensions"):
        encode_avi_ifv([frames[0], frames[0][:-1]])
    with pytest.raises(ValueError, match="gop"):
        encode_avi_ifv(frames, gop=0)

    # flip the first frame's type byte: 'I' -> 'X'
    i_pos = good.index(b"00dc") + 8
    bad = bytearray(good)
    assert bad[i_pos:i_pos + 1] == b"I"
    bad[i_pos] = ord("X")
    with pytest.raises(ValueError, match="unknown IFV frame type"):
        decode_avi_ifv(bytes(bad))

    # truncate the last chunk body
    with pytest.raises(ValueError, match="truncated|error"):
        decode_avi_ifv(good[:-20])

    # a P-frame with no I-frame before it: excise the first chunk by
    # rebuilding movi with only P frames — simpler: corrupt the I
    # marker into a P marker and expect the size guard or the
    # reference guard to fire loudly (never a silent wrong decode)
    bad2 = bytearray(good)
    bad2[i_pos] = ord("P")
    with pytest.raises(ValueError):
        decode_avi_ifv(bytes(bad2))

    # corrupt zlib stream
    bad3 = bytearray(good)
    bad3[i_pos + 5] ^= 0xFF
    with pytest.raises((ValueError, zlib.error)):
        decode_avi_ifv(bytes(bad3))


def test_mjpeg_decoder_rejects_ifv():
    """Container cross-talk: an IFV file handed to the MJPEG decoder
    must error (its chunks are not JPEG), never silently decode."""
    from bigdatabowl2024_25_spark.operators.media_av import (
        decode_avi_mjpeg,
    )

    p = encode_avi_ifv(_scene(n=2), q=8)
    with pytest.raises(ValueError):
        decode_avi_mjpeg(p)


def test_distributed_decode_matches_local(spark):
    import pandas as pd

    from bigdatabowl2024_25_spark.operators.multimodal import (
        decode_video_ifv,
    )

    payloads = []
    for d in range(6):
        h, w, nf = 9 + d % 6, 12 + (d * 5) % 9, 3 + d % 4
        frames = [
            ((np.add.outer(np.arange(h) * 11, np.arange(w) * 7)[..., None]
              + np.arange(3) * 29 + d * 13 + i * 17) % 256).astype(
                np.uint8
            )
            for i in range(nf)
        ]
        payloads.append((d, encode_avi_ifv(frames, fps=5, q=6, gop=3)))
    df = spark.createDataFrame(
        payloads + [(99, b"not a video")],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in decode_video_ifv(df).collect()}
    for d in range(6):
        r = rows[d]
        assert r.ok and r.n_frames == 3 + d % 4 and r.fps == 5
        assert (r.height, r.width) == (9 + d % 6, 12 + (d * 5) % 9)
        # first frame is lossless: pixel (0,0) comes straight from
        # the generator formula
        exp = [(k * 29 + d * 13) % 256 for k in range(3)]
        assert r.first_pixel == exp[0] + 256 * exp[1] + 65536 * exp[2]
    assert rows[99].ok is False and rows[99].n_frames is None


def test_ifv_fuzz_roundtrip_bound():
    """Randomized geometry fuzz: arbitrary dims (incl. tiny and
    off-grid), gop/q/search combinations — every decode honors the
    error bound and shape contract."""
    rng = np.random.default_rng(42)
    for _ in range(15):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        nf = int(rng.integers(1, 7))
        q = int(rng.choice([2, 3, 8, 31, 255]))
        gop = int(rng.integers(1, 6))
        search = int(rng.choice([0, 1, 4]))
        frames = [
            rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            for _ in range(nf)
        ]
        out, fps = decode_avi_ifv(
            encode_avi_ifv(frames, fps=9, q=q, gop=gop, search=search)
        )
        assert fps == 9 and len(out) == nf
        bound = q // 2 + 1
        for f, o in zip(frames, out):
            assert o.shape == f.shape
            assert int(np.abs(o.astype(int) - f.astype(int)).max()) <= bound


def test_sample_ifv_frames_gop_pruning():
    """GOP-pruned sampling returns exactly the frames full decode
    returns at those indices (bit-identical — the closed loop means a
    partially-decoded GOP reconstructs the same states), and the
    guard contract holds."""
    frames = _scene(n=12)
    p = encode_avi_ifv(frames, fps=5, q=6, gop=3)
    from bigdatabowl2024_25_spark.operators.media_av import (
        sample_ifv_frames,
    )

    full, _ = decode_avi_ifv(p)
    for every_n in (1, 2, 4, 5, 7, 12):
        got = sample_ifv_frames(p, every_n)
        want = full[::every_n]
        assert len(got) == len(want)
        assert all((g == w).all() for g, w in zip(got, want))
    with pytest.raises(ValueError, match="every_n"):
        sample_ifv_frames(p, 0)
    with pytest.raises(ValueError, match="RIFF"):
        sample_ifv_frames(b"junk")


def test_zero_area_frames_rejected():
    with pytest.raises(ValueError, match="zero-area"):
        encode_avi_ifv([np.zeros((0, 8, 3), dtype=np.uint8)])
    with pytest.raises(ValueError, match="zero-area"):
        encode_avi_ifv([np.zeros((8, 0, 3), dtype=np.uint8)])


def test_transform_mode_roundtrip_and_seams():
    """The DCT transform mode ('T' frames): orthonormality preserves
    L2 so the coefficient-domain quantizer gives ~q/sqrt(12) RMS error
    (pinned as a generous x3 band); I-frames stay lossless, the closed
    loop holds across GOP seams, encoding is byte-stable, and the
    spatial mode's bytes are untouched by the new parameter."""
    frames = _scene(n=9)
    q, gop = 8, 3
    p = encode_avi_ifv(frames, fps=5, q=q, gop=gop, transform=True)
    out, fps = decode_avi_ifv(p)
    assert fps == 5 and len(out) == len(frames)
    rms_budget = 3.0 * q / np.sqrt(12.0)
    for i, (f, o) in enumerate(zip(frames, out)):
        assert o.shape == f.shape
        err = o.astype(float) - f.astype(float)
        if i % gop == 0:
            assert (o == f).all()
        else:
            assert float(np.sqrt((err ** 2).mean())) <= rms_budget, i
    # determinism + default-mode byte stability
    assert p == encode_avi_ifv(frames, fps=5, q=q, gop=gop, transform=True)
    assert encode_avi_ifv(frames, fps=5, q=q, gop=gop) == encode_avi_ifv(
        frames, fps=5, q=q, gop=gop, transform=False
    )
    # GOP-pruned sampling reconstructs T-frame GOPs bit-identically
    from bigdatabowl2024_25_spark.operators.media_av import (
        sample_ifv_frames,
    )

    for every_n in (2, 4):
        got = sample_ifv_frames(p, every_n)
        want = out[::every_n]
        assert all((g == w).all() for g, w in zip(got, want))
    # distributed decode reads T-mode files like any other IFV file
    # (first frame is a lossless I-frame either way)


def test_transform_mode_beats_spatial_on_smooth_content():
    """Transform coding's reason to exist: on smooth residuals the
    DCT compacts energy into few coefficients — at the same q the 'T'
    mode must reconstruct strictly better (lower worst-frame RMSE) on
    a smooth gradient scene, at a comparable payload size."""
    yy, xx = np.mgrid[0:80, 0:100]
    base = np.stack(
        [(yy * 2 + xx) % 256, (yy + xx * 2) % 256, (yy * 3) % 256],
        axis=-1,
    ).astype(np.uint8)
    frames = [base[i:i + 64, 2 * i:2 * i + 80].copy() for i in range(6)]

    def worst_rmse(payload):
        out, _ = decode_avi_ifv(payload)
        return max(
            float(np.sqrt(((o.astype(float) - f.astype(float)) ** 2).mean()))
            for o, f in zip(out, frames)
        )

    ps = encode_avi_ifv(frames, fps=5, q=8, gop=6)
    pt = encode_avi_ifv(frames, fps=5, q=8, gop=6, transform=True)
    assert worst_rmse(pt) < worst_rmse(ps)
    assert len(pt) < 2 * len(ps)


def test_review_fixes_bomb_fps_and_sampler_parity():
    """Round-13 review fixes: (a) a zlib decompression bomb in a
    frame chunk raises the coerce-path ValueError instead of
    inflating unbounded; (b) fps is validated; (c) the sampler and
    the full decoder REJECT the same corrupt T-frame (shared
    reconstruction helper — they cannot diverge)."""
    frames = _scene(n=4)
    good = encode_avi_ifv(frames, fps=5, q=6, gop=4, transform=True)

    # (a) replace the first I-frame body IN PLACE (same chunk length,
    # so the container stays structurally valid) with a stream that
    # inflates to ~10x the expected frame size: the bounded inflate
    # must stop at expected+1 bytes and raise, never inflate it all
    i_pos = good.index(b"00dc")
    (ln,) = struct.unpack("<I", good[i_pos + 4:i_pos + 8])
    bomb = b"I\x00" + zlib.compress(b"\x00" * 60_000, 9)
    assert len(bomb) <= ln  # fits the original chunk
    bomb = bomb + b"\x00" * (ln - len(bomb))
    bad = bytearray(good)
    bad[i_pos + 8:i_pos + 8 + ln] = bomb
    with pytest.raises(ValueError, match="size mismatch"):
        decode_avi_ifv(bytes(bad))

    # (b) fps bounds
    for fps in (0, -3, 2_000_000):
        with pytest.raises(ValueError, match="fps"):
            encode_avi_ifv(frames, fps=fps)

    # (c) corrupt a T-frame's block-size byte: both views must raise
    from bigdatabowl2024_25_spark.operators.media_av import (
        sample_ifv_frames,
    )

    t_pos = good.index(b"00dc", i_pos + 8)  # second frame chunk
    assert good[t_pos + 8:t_pos + 9] == b"T"
    corrupt = bytearray(good)
    corrupt[t_pos + 10] = 2  # B=2 on a T frame
    for fn in (decode_avi_ifv, lambda p: sample_ifv_frames(p, 1)):
        with pytest.raises(ValueError):
            fn(bytes(corrupt))


def test_decode_video_ifv_every_n_and_info(spark):
    """The distributed decoder's GOP-pruned sampling path: sampled
    frame counts match the stride, header fields still report native
    values, and ifv_info reads GOP geometry without inflating."""
    import pandas as pd

    from bigdatabowl2024_25_spark.operators.media_av import ifv_info
    from bigdatabowl2024_25_spark.operators.multimodal import (
        decode_video_ifv,
    )

    frames = _scene(n=10)
    p = encode_avi_ifv(frames, fps=5, q=6, gop=3)
    info = ifv_info(p)
    assert info == {
        "fps": 5, "width": 50, "height": 37,
        "n_frames": 10, "n_keyframes": 4,
    }
    df = spark.createDataFrame([(0, p)], "media_id long, payload binary")
    full = decode_video_ifv(df).collect()[0]
    sampled = decode_video_ifv(df, every_n=4).collect()[0]
    assert full.n_frames == 10 and sampled.n_frames == 3  # 0,4,8
    assert (sampled.fps, sampled.width, sampled.height) == (5, 50, 37)
    assert sampled.first_pixel == full.first_pixel  # frame 0 kept
    with pytest.raises(ValueError, match="every_n"):
        decode_video_ifv(df, every_n=0)

"""Round-14 edge audit (the standing ADVICE-class pattern): corner
geometries and degenerate inputs on the round-13/14 surface — IFV at
parameter extremes and long streams, MDCT at frame-boundary lengths,
transcode_audio fed already-compressed input, and the binaryFile
zero-match / only-empty-file traps."""

from __future__ import annotations

import os

import numpy as np
import pytest

from bigdatabowl2024_25_spark.operators.media_av import (
    decode_avi_ifv,
    decode_wav_mdct,
    encode_avi_ifv,
    encode_wav_ima_adpcm,
    encode_wav_mdct,
    ifv_info,
    sample_ifv_frames,
)


def test_ifv_parameter_extremes():
    """gop=1 (all-I, lossless), search=0 (zero-motion predictor),
    single frame, and q at the 255 header cap — each under the zlib
    and huffman entropy stages (the range stage's cross-mode identity
    is pinned in test_range_coder); the sampler agrees with the full
    decode everywhere."""
    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, (11, 14, 3)).astype(np.uint8)
        for _ in range(5)
    ]
    for entropy in ("zlib", "huffman"):
        # gop=1: every frame lossless
        out, _ = decode_avi_ifv(
            encode_avi_ifv(frames, q=8, gop=1, entropy=entropy)
        )
        assert all((o == f).all() for o, f in zip(out, frames))
        # search=0: prediction is the co-located block, bound holds
        p = encode_avi_ifv(frames, q=6, gop=5, search=0,
                           entropy=entropy)
        out, _ = decode_avi_ifv(p)
        for f, o in zip(frames, out):
            assert int(np.abs(o.astype(int) - f.astype(int)).max()) <= 4
        # single frame (one I, no P)
        one = [frames[0]]
        out, _ = decode_avi_ifv(encode_avi_ifv(one, q=8,
                                               entropy=entropy))
        assert (out[0] == one[0]).all()
        # q at the uint8 header cap
        p = encode_avi_ifv(frames, q=255, gop=3, entropy=entropy)
        out, _ = decode_avi_ifv(p)
        assert all(o.shape == f.shape for o, f in zip(out, frames))
        got = sample_ifv_frames(p, 2)
        assert all((g == w).all() for g, w in zip(got, out[::2]))
    with pytest.raises(ValueError, match="q must be"):
        encode_avi_ifv(frames, q=256)


def test_ifv_255_frame_stream():
    """A 255-frame video (85 GOPs at gop=3): header counts stay
    exact, GOP-pruned sampling touches only the sampled GOPs, and the
    closed loop holds to the last frame."""
    base = (
        np.add.outer(np.arange(6) * 3, np.arange(8) * 5)[..., None]
        + np.arange(3)
    ).astype(np.int64)
    frames = [
        ((base + i * 7) % 256).astype(np.uint8) for i in range(255)
    ]
    p = encode_avi_ifv(frames, fps=5, q=4, gop=3)
    info = ifv_info(p)
    assert info["n_frames"] == 255 and info["n_keyframes"] == 85
    out, _ = decode_avi_ifv(p)
    assert len(out) == 255
    assert int(
        np.abs(out[-1].astype(int) - frames[-1].astype(int)).max()
    ) <= 3
    got = sample_ifv_frames(p, 50)  # frames 0,50,...,250
    assert len(got) == 6
    assert all((g == out[i * 50]).all() for i, g in enumerate(got))


def test_mdct_frame_boundary_lengths():
    """n == frame (exactly two hops) and n < frame/2 (single partial
    hop) — the two seams the padding rule must keep exact, in every
    mode combination; plus the minimum n=1 payload."""
    rng = np.random.default_rng(8)
    modes = [
        dict(),
        dict(entropy="huffman"),
        dict(alloc="psy"),
        dict(entropy="huffman", alloc="psy"),
    ]
    for frame in (16, 128):
        half = frame // 2
        for n in (1, half // 2, frame, frame + 1):
            x = (rng.standard_normal(n) * 9000).astype(np.int16)
            for kw in modes:
                y, rate = decode_wav_mdct(
                    encode_wav_mdct(x, 16_000, frame=frame, qbits=6,
                                    **kw)
                )
                assert len(y) == n and rate == 16_000, (frame, n, kw)


def test_transcode_audio_rejects_compressed_input(spark):
    """Feeding ALREADY-COMPRESSED payloads (ADPCM / MDCT output) back
    into transcode_audio must coerce those rows to null (decode_wav
    rejects non-PCM tags), never silently re-encode garbage — and
    n_bytes_in still reports the input size for audit."""
    from bigdatabowl2024_25_spark.operators.multimodal import (
        transcode_audio,
    )

    sig = (np.arange(200, dtype=np.int64) * 131 % 3001 - 1500).astype(
        np.int16
    )
    adpcm = encode_wav_ima_adpcm(sig, 8000)
    mdct = encode_wav_mdct(sig, 8000)
    df = spark.createDataFrame(
        [(0, adpcm), (1, mdct), (2, b"junk")],
        "media_id long, payload binary",
    )
    rows = {
        r.media_id: r
        for r in transcode_audio(df, codec="adpcm").collect()
    }
    for mid, src in ((0, adpcm), (1, mdct), (2, b"junk")):
        assert rows[mid].payload is None
        assert rows[mid].n_bytes_out is None
        assert rows[mid].n_bytes_in == len(src)


def test_read_binary_files_zero_match_and_only_empty(spark, tmp_path):
    """The binaryFile traps, pinned: a glob matching ZERO files and a
    directory holding ONLY zero-length files must both return an
    empty frame with the binaryFile schema (Spark 4.1 silently skips
    empty files — documented in sources/io.py), never raise."""
    from bigdatabowl2024_25_spark.sources.io import read_binary_files

    d = str(tmp_path / "blobs")
    os.makedirs(d)
    with open(f"{d}/a.bin", "wb") as fh:
        fh.write(b"payload")
    with open(f"{d}/empty1.dat", "wb"):
        pass
    with open(f"{d}/empty2.dat", "wb"):
        pass
    # zero glob matches
    none = read_binary_files(spark, d, glob_filter="*.nomatch")
    assert none.count() == 0
    assert set(none.columns) >= {"path", "length", "content"}
    # only-empty matches: the skip trap yields zero rows, not an error
    empties = read_binary_files(spark, d, glob_filter="*.dat")
    assert empties.count() == 0
    # sanity: the non-empty file still surfaces, max_bytes probe runs
    # its eager status check on the empty-only selection too
    assert read_binary_files(
        spark, d, glob_filter="*.bin", max_bytes=100
    ).count() == 1
    assert read_binary_files(
        spark, d, glob_filter="*.dat", max_bytes=1
    ).count() == 0


def test_transcode_video_mjpeg_to_ifv(spark):
    """The video compress-at-ingest pass: MJPEG payloads re-encode
    through the inter-frame codec distributed; decoded output stays
    within the IFV error bound OF THE DECODED MJPEG FRAMES (JPEG
    already quantized the pixels), fps/dims/frame counts carry over,
    compression beats the intra-only source on a translating scene,
    and corrupt / non-MJPEG inputs coerce to null rows."""
    from bigdatabowl2024_25_spark.operators.media_av import (
        decode_avi_ifv,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from bigdatabowl2024_25_spark.operators.multimodal import (
        transcode_video,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (60, 80, 3)).astype(np.uint8)
    payloads = []
    for d in range(4):
        frames = [
            base[i : i + 40, 2 * i : 2 * i + 50].copy()
            for i in range(3 + d)
        ]
        payloads.append((d, encode_avi_mjpeg(frames, fps=5 + d)))
    df = spark.createDataFrame(
        payloads + [(9, b"not a video"), (10, None)],
        "media_id long, payload binary",
    )
    q = 6
    rows = {
        r.media_id: r
        for r in transcode_video(df, q=q, gop=3, entropy="range")
        .collect()
    }
    for d, src in payloads:
        r = rows[d]
        assert r.n_bytes_in == len(src) and r.n_bytes_out == len(
            r.payload
        )
        out, fps = decode_avi_ifv(bytes(r.payload))
        ref, src_fps = decode_avi_mjpeg(src)
        assert fps == src_fps == 5 + d and len(out) == len(ref)
        bound = q // 2 + 1
        for o, f in zip(out, ref):
            assert o.shape == f.shape
            assert int(np.abs(o.astype(int) - f.astype(int)).max()) <= bound
        # inter-frame coding wins on the translating scene
        assert r.n_bytes_out < r.n_bytes_in
    assert rows[9].payload is None and rows[9].n_bytes_in == 11
    assert rows[10].payload is None and rows[10].n_bytes_in is None
    # configuration errors raise on the driver, never coerce
    with pytest.raises(ValueError, match="entropy"):
        transcode_video(df, entropy="lzma")
    with pytest.raises(ValueError, match="q in"):
        transcode_video(df, q=1)


def test_transcode_audio_mode_knobs(spark):
    """entropy/alloc forward to the MDCT encoder (loaded headers
    prove it); non-default knobs with codec='adpcm' raise on the
    driver instead of being silently ignored."""
    from bigdatabowl2024_25_spark.operators.media_av import (
        encode_wav,
        mdct_info,
    )
    from bigdatabowl2024_25_spark.operators.multimodal import (
        transcode_audio,
    )

    sig = (np.arange(400, dtype=np.int64) * 131 % 3001 - 1500).astype(
        np.int16
    ).reshape(-1, 1)
    df = spark.createDataFrame(
        [(0, encode_wav(sig, 8000))], "media_id long, payload binary"
    )
    row = transcode_audio(
        df, codec="mdct", entropy="range", alloc="psy"
    ).collect()[0]
    info = mdct_info(bytes(row.payload))
    assert info["entropy"] == "range" and info["alloc"] == "psy"
    with pytest.raises(ValueError, match="MDCT codec only"):
        transcode_audio(df, codec="adpcm", entropy="huffman")
    with pytest.raises(ValueError, match="entropy must be"):
        transcode_audio(df, codec="mdct", entropy="lzma")

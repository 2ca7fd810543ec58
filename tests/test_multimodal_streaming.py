"""Multimodal plumbing + streaming replay tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators import multimodal
from bigdatabowl2024_25_spark.streaming import replay


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, "image", bytes([i % 251]) * (100 + i), f"src{i % 3}")
        for i in range(20)
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_metadata_jvm_side(media):
    out = multimodal.attach_metadata(media).collect()
    assert all(r.byte_len == 100 + r.media_id for r in out)
    assert all(len(r.content_md5) == 32 for r in out)


def test_decode_fake_deterministic(media):
    a = {r.media_id: (r.width, r.height) for r in multimodal.decode_media(media).collect()}
    b = {r.media_id: (r.width, r.height) for r in multimodal.decode_media(media.repartition(7)).collect()}
    assert a == b
    assert all(64 <= w < 256 for w, _ in a.values())


def test_decode_real_is_stubbed(media):
    with pytest.raises(Exception) as exc:
        multimodal.decode_media(media, codec="real").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_feature_extraction_shape(media):
    out = multimodal.extract_features(media, dim=16).collect()
    assert len(out) == 20
    assert all(len(r.features) == 16 for r in out)
    # content-determined: same payload → same features
    again = multimodal.extract_features(media, dim=16).collect()
    assert {r.media_id: tuple(r.features) for r in out} == {
        r.media_id: tuple(r.features) for r in again
    }


def test_frame_sampling(spark):
    df = spark.createDataFrame(
        [(1, 95), (2, 10)], "media_id long, n_frames int"
    )
    out = multimodal.sample_frames(df, every_n=10).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    assert by_id[1] == list(range(0, 95, 10))
    assert by_id[2] == [0]


def test_streaming_matches_batch(spark, tmp_path):
    """The streaming tumbling aggregate over a file replay must equal
    the batch equivalent (same event-time logic, W12/secondId analog)."""
    from bigdatabowl2024_25_spark.sources.io import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "value"
    )
    path = str(tmp_path / "stream_src")
    events.repartition(3).write.parquet(path)

    static = spark.read.parquet(path)
    stream = replay.stream_from_dir(spark, path, static.schema)
    # complete mode, no watermark: the replayed stream must reproduce
    # the batch aggregate EXACTLY (file order / late data irrelevant)
    replay.run_to_memory(
        replay.tumbling_counts(stream, watermark=None),
        "tumbling_test",
        mode="complete",
    )
    got = spark.table("tumbling_test")

    expected = static.groupBy(
        F.window("ts", "10 seconds"), F.col("user_id")
    ).agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))

    g = {
        (r.window.start, r.user_id): (r.n_events, round(r.sum_value, 6))
        for r in got.collect()
    }
    e = {
        (r.window.start, r.user_id): (r.n_events, round(r.sum_value, 6))
        for r in expected.collect()
    }
    assert g == e and len(g) > 0


def test_session_windows(spark, tmp_path):
    from bigdatabowl2024_25_spark.sources.io import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "ts", "user_id", "value"
    )
    path = str(tmp_path / "session_src")
    events.limit(200).write.parquet(path)
    static = spark.read.parquet(path)
    stream = replay.stream_from_dir(spark, path, static.schema)
    replay.run_to_memory(
        replay.session_slices(stream), "session_test", mode="append"
    )
    out = spark.table("session_test").collect()
    assert len(out) > 0
    assert all(r.n_events >= 1 for r in out)


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: per-key state must accumulate across
    micro-batches (3 files replayed one per trigger) and finish equal
    to the batch aggregate — count/sum are order-free, so this holds
    for ANY file arrival order."""
    from bigdatabowl2024_25_spark.sources.io import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "value"
    )
    path = str(tmp_path / "state_src")
    events.repartition(3).write.parquet(path)
    static = spark.read.parquet(path)
    stream = replay.stream_from_dir(spark, path, static.schema)
    replay.run_to_memory(
        replay.stateful_running_totals(stream), "state_test", mode="update"
    )
    got = spark.table("state_test").collect()
    # the memory sink holds one row per key per touching batch; the
    # LAST (max n_events) per key is the final state
    final = {}
    for r in got:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, round(r.total_value, 6))
    expected = {
        r.user_id: (r.n, round(r.total, 6))
        for r in static.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert final == expected and len(final) > 0


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream range join (q93 'join' branch's
    production path): clicks ⋈ views within a 24 h lookback, replayed
    over 4 micro-batches WITH watermarks wide enough that no valid
    match can be evicted — the drained append-mode result must equal
    the batch join exactly (matching is set-like, so arrival order is
    irrelevant)."""
    from bigdatabowl2024_25_spark.sources.io import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "ts", "user_id", "value", "event_type"
    )
    path = str(tmp_path / "ssj_src")
    events.repartition(4).write.parquet(path)
    static = spark.read.parquet(path)

    def sides(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", "ts"
        )
        views = df.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "value"
        )
        return clicks, views

    sc, sv = sides(replay.stream_from_dir(spark, path, static.schema))
    # the whole corpus spans ~30 days; a 90-day watermark admits every
    # row in every arrival order while still exercising the
    # watermarked state-eviction plumbing
    joined = replay.stream_stream_join(
        sc, sv, key="user_id", ts_col="ts",
        lookback="24 hours", watermark="90 days",
    )
    replay.run_to_memory(joined, "ssj_test", mode="append")
    # MULTISET compare: a duplicate-emission bug (the classic
    # state-store regression) must not be collapsed by set semantics
    from collections import Counter

    got = Counter(
        (r.l_key, r.l_ts, r.r_ts, round(r.r_value, 6))
        for r in spark.table("ssj_test").collect()
    )

    bc, bv = sides(static)
    expected = Counter(
        (r.l_key, r.l_ts, r.r_ts, round(r.r_value, 6))
        for r in bc.select(
            F.col("user_id").alias("l_key"), F.col("ts").alias("l_ts")
        )
        .join(
            bv.select(
                F.col("user_id").alias("r_key"),
                F.col("ts").alias("r_ts"),
                F.col("value").alias("r_value"),
            ),
            (F.col("l_key") == F.col("r_key"))
            & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 24 hours"))
            & (F.col("r_ts") <= F.col("l_ts")),
        )
        .collect()
    )
    assert got == expected and len(got) > 0


def test_incremental_ingest_exactly_once(spark, tmp_path):
    """Checkpointed incremental ingest (incremental_to_parquet): run 1
    drains the initial files; an immediate re-run with the same
    checkpoint is a no-op (no duplicates); after a new file arrives, a
    re-run appends exactly its rows — the sink always equals one batch
    read of the source. This is the replayable-source + checkpointed-
    WAL + transactional-sink contract incremental pipelines rely on."""
    from bigdatabowl2024_25_spark.sources.io import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "value"
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first, second = events.filter(F.col("event_id") % 2 == 0), events.filter(
        F.col("event_id") % 2 == 1
    )
    first.repartition(2).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def drain():
        replay.incremental_to_parquet(
            replay.stream_from_dir(spark, src, schema), out, ckpt
        )
        return spark.read.parquet(out)

    n1 = drain().count()
    assert n1 == first.count()
    # re-run, nothing new: exactly-once means no duplicates
    assert drain().count() == n1
    # new file arrives; only its rows are appended
    second.coalesce(1).write.mode("append").parquet(src)
    got = drain()
    assert got.count() == events.count()
    assert {r.event_id for r in got.select("event_id").collect()} == {
        r.event_id for r in events.select("event_id").collect()
    }


def test_resize_plumbing(media):
    out = multimodal.resize_media(media, 32, 32).collect()
    assert len(out) == 20
    assert all(r.width == 32 and r.height == 32 for r in out)
    # real resize: output size is target-determined, input-independent
    sizes = {len(bytes(r.payload)) for r in out}
    assert len(sizes) == 1
    # deterministic: same content -> same resized bytes
    again = {r.media_id: bytes(r.payload) for r in multimodal.resize_media(media, 32, 32).collect()}
    assert {r.media_id: bytes(r.payload) for r in out} == again
    import pytest as _pytest
    with _pytest.raises(Exception):
        multimodal.resize_media(media, 32, 32, codec="real").collect()


def _gradient(h, w, channels):
    import numpy as np

    return (
        np.arange(h * w * channels, dtype=np.uint32).reshape(h, w, channels)
        * 7 % 256
    ).astype(np.uint8)


def test_png_roundtrip_all_filters():
    """The pure-stdlib PNG codec: encode→decode is identity, and the
    decoder reverses every scanline filter type (a hand-filtered
    stream exercises Sub/Up/Average/Paeth)."""
    import struct
    import zlib

    import numpy as np

    for channels in (1, 2, 3, 4):
        img = _gradient(5, 4, channels)
        assert np.array_equal(
            multimodal.decode_png(multimodal.encode_png(img)), img
        )

    # hand-filter a 5-row gray image with filters 0..4
    img = _gradient(5, 6, 1)
    stride = 6
    raw = bytearray()
    prev = bytearray(stride)
    for r, ft in enumerate([0, 1, 2, 3, 4]):
        line = bytearray(img[r, :, 0].tobytes())
        enc = bytearray(line)
        for i in range(stride):
            a = line[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            if ft == 1:
                enc[i] = (line[i] - a) & 0xFF
            elif ft == 2:
                enc[i] = (line[i] - b) & 0xFF
            elif ft == 3:
                enc[i] = (line[i] - (a + b) // 2) & 0xFF
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc[i] = (line[i] - pr) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(multimodal.decode_png(payload), img)


def test_png_decode_media_real_codec(spark):
    """decode_media(codec='png') on real 2x2 PNG fixtures: correct
    dims/channels, corrupt payloads coerce to ok=False."""
    import numpy as np

    good = multimodal.encode_png(_gradient(2, 2, 3))
    gray = multimodal.encode_png(_gradient(3, 2, 1))
    rows = [
        (0, "image", good, "fixture"),
        (1, "image", gray, "fixture"),
        (2, "image", b"not a png at all", "fixture"),
        (3, "image", good[:20], "fixture"),  # truncated
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.decode_media(df, codec="png").collect()}
    assert (out[0].width, out[0].height, out[0].n_channels, out[0].ok) == (2, 2, 3, True)
    assert (out[1].width, out[1].height, out[1].n_channels, out[1].ok) == (2, 3, 1, True)
    assert out[2].ok is False and out[2].width is None
    assert out[3].ok is False

    # CRC corruption must be caught, not silently decoded
    corrupt = bytearray(good)
    corrupt[-18] ^= 0xFF  # flip a byte inside IDAT payload
    df2 = spark.createDataFrame(
        [(9, "image", bytes(corrupt), "fixture")], multimodal.MEDIA_SCHEMA
    )
    assert multimodal.decode_media(df2, codec="png").first().ok is False


def test_png_resize_real_codec(spark):
    """resize_media(codec='png'): output payloads are real PNGs at the
    target dims; constant regions survive nearest-neighbor exactly."""
    import numpy as np

    img = np.repeat(np.repeat(_gradient(2, 2, 3), 2, axis=0), 2, axis=1)  # 4x4 blocks
    df = spark.createDataFrame(
        [(0, "image", multimodal.encode_png(img), "fixture")],
        multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.resize_media(df, width=2, height=2, codec="png").first()
    arr = multimodal.decode_png(bytes(out.payload))
    assert arr.shape == (2, 2, 3)
    assert np.array_equal(arr, img[::2, ::2])  # block-constant → exact


def test_jpeg_roundtrip():
    """Baseline JPEG codec: valid marker structure, near-lossless on
    smooth content, exact on flat blocks, deterministic, grayscale +
    RGB, corrupt payloads raise (→ coerce upstream)."""
    import numpy as np

    from bigdatabowl2024_25_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [xx * 255 // 55, yy * 255 // 39, (xx + yy) * 255 // 94], axis=-1
    ).astype(np.uint8)
    enc = encode_jpeg(img, quality=90)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dec = decode_jpeg(enc)
    assert dec.shape == (40, 56, 3)
    assert int(np.max(np.abs(dec.astype(int) - img.astype(int)))) <= 6
    # flat color is exact after quantization
    flat = np.full((16, 24, 3), 120, np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(flat, 90)), flat
    )
    # grayscale single-component scan
    g = (yy * 255 // 39).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(g, 90))
    assert dg.shape == (40, 56, 1)
    assert int(np.max(np.abs(dg[:, :, 0].astype(int) - g.astype(int)))) <= 2
    # bit-determinism of the encoder
    assert encode_jpeg(img, quality=90) == enc
    # non-8-multiple dims exercised above (40x56 is, use 13x9 too)
    odd = img[:13, :9]
    assert decode_jpeg(encode_jpeg(odd, 85)).shape == (13, 9, 3)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_jpeg(enc[:40])
    with _pytest.raises(ValueError):
        decode_jpeg(b"garbage bytes")


def test_jpeg_decode_and_resize_media(spark):
    """Spark-side jpeg codec paths: decode_media dims + coerce,
    resize_media emits decodable JPEGs at target dims."""
    import numpy as np

    from bigdatabowl2024_25_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:16, 0:16]
    img = np.stack([xx * 15, yy * 15, xx * 0 + 99], axis=-1).astype(np.uint8)
    rows = [
        (0, "image", encode_jpeg(img, 90), "fixture"),
        (1, "image", b"not a jpeg", "fixture"),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {
        r.media_id: r
        for r in multimodal.decode_media(df, codec="jpeg").collect()
    }
    assert (out[0].width, out[0].height, out[0].ok) == (16, 16, True)
    assert out[1].ok is False
    res = multimodal.resize_media(df, width=8, height=8, codec="jpeg").collect()
    by_id = {r.media_id: r for r in res}
    arr = decode_jpeg(bytes(by_id[0].payload))
    assert arr.shape == (8, 8, 3)
    assert by_id[1].payload is None  # corrupt → coerced null


def test_jpeg_restart_interval_roundtrip():
    """DRI/RSTn path: encoder emits restart segments, decoder realigns
    at every boundary; output identical to the no-restart encode."""
    import numpy as np

    from bigdatabowl2024_25_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:24, 0:40]
    img = np.stack(
        [xx * 6, yy * 10, (xx * yy) % 256], axis=-1
    ).astype(np.uint8)
    plain = encode_jpeg(img, quality=85)
    restarted = encode_jpeg(img, quality=85, restart_interval=3)
    assert restarted != plain  # DRI + RSTn markers present
    assert b"\xff\xdd" in restarted
    # decoded pixels identical: restart markers are transparent
    assert np.array_equal(decode_jpeg(restarted), decode_jpeg(plain))
    # grayscale too (single-component MCUs)
    g = ((xx + yy) % 256).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, 85, restart_interval=2)),
        decode_jpeg(encode_jpeg(g, 85)),
    )


def test_jpeg_restart_padding_bits_are_ignored():
    """Adversarial padding: an external encoder may pad the byte before
    RSTn with ANY bits (spec says padding is arbitrary). Zeroed padding
    must not decode as a phantom MCU — the decoder byte-aligns and
    consumes the marker explicitly."""
    import numpy as np

    from bigdatabowl2024_25_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:16, 0:32]
    img = np.stack([xx * 8, yy * 16, xx + yy], axis=-1).astype(np.uint8)
    enc = bytearray(encode_jpeg(img, quality=85, restart_interval=1))
    ref = decode_jpeg(bytes(enc))
    # find each RSTn and clear the low bits of the preceding byte
    # (the 1-padding) — unless that byte is part of a stuffed FF00 or
    # itself a marker byte
    sos = enc.find(b"\xff\xda")
    mutated = bytearray(enc)
    n_mut = 0
    for i in range(sos, len(enc) - 1):
        if enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7:
            prev = enc[i - 1]
            if prev not in (0x00, 0xFF) and prev & 1:
                mutated[i - 1] = prev & 0xFE  # flip lowest padding bit
                n_mut += 1
    assert n_mut > 0, "fixture produced no mutable padding bytes"
    # NOTE: flipping the LAST padding bit may touch a data bit if the
    # MCU ended exactly one bit short of the boundary; tolerate either
    # a bit-identical decode or a tiny local diff, but never a shape
    # change or an exception (phantom-MCU desync would give both)
    out = decode_jpeg(bytes(mutated))
    assert out.shape == ref.shape
    same = np.mean(out == ref)
    assert same > 0.95, f"restart desync: only {same:.2%} pixels match"


def test_jpeg_fuzz_corruption_coerces():
    """Fuzz the error contract (ADVICE r05): truncations and byte
    flips of a valid JPEG must either decode or raise ValueError —
    never IndexError/KeyError/OverflowError — and the Spark
    decode_media/resize_media coerce paths must survive them."""
    import numpy as np

    from bigdatabowl2024_25_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:16, 0:24]
    img = np.stack([xx * 10, yy * 15, xx + yy], axis=-1).astype(np.uint8)
    enc = encode_jpeg(img, quality=80, restart_interval=2)

    rng = np.random.default_rng(20260814)
    payloads = []
    # truncations at every region boundary + random cuts
    for cut in [2, 4, 10, 20, len(enc) // 2, len(enc) - 3, len(enc) - 1]:
        payloads.append(enc[:cut])
    # single-byte flips across the file, deterministic positions
    for pos in rng.integers(2, len(enc), size=150):
        for val in (0x00, 0xFF, enc[pos] ^ 0x40):
            m = bytearray(enc)
            m[pos] = val
            payloads.append(bytes(m))
    for p in payloads:
        try:
            out = decode_jpeg(p)
            assert out.dtype == np.uint8
        except ValueError:
            pass  # the one permitted failure mode


def test_jpeg_fuzz_spark_coerce(spark):
    """The same fuzz corpus through the Arrow batch path: corrupt rows
    coerce to null/ok=False; valid rows still decode. One bad payload
    must never fail the batch."""
    import numpy as np

    from bigdatabowl2024_25_spark.operators import multimodal
    from bigdatabowl2024_25_spark.operators.jpeg import encode_jpeg

    yy, xx = np.mgrid[0:16, 0:24]
    img = np.stack([xx * 10, yy * 15, xx + yy], axis=-1).astype(np.uint8)
    enc = encode_jpeg(img, quality=80)
    rng = np.random.default_rng(7)
    rows = [(0, "image", enc, "good")]
    for i, pos in enumerate(rng.integers(2, len(enc), size=40), start=1):
        m = bytearray(enc)
        m[pos] ^= 0xFF
        rows.append((i, "image", bytes(m), "fuzzed"))
    rows.append((99, "image", enc[: len(enc) // 3], "truncated"))
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    dec = multimodal.decode_media(df, codec="jpeg").collect()
    assert len(dec) == len(rows)  # no batch died
    by_id = {r.media_id: r for r in dec}
    assert by_id[0].ok is True and by_id[0].width == 24
    assert by_id[99].ok is False
    res = multimodal.resize_media(df, width=4, height=4, codec="jpeg").collect()
    assert len(res) == len(rows)
    assert {r.media_id: r.payload is not None for r in res}[0] is True


def test_wav_roundtrip_and_corruption():
    """PCM WAV codec: lossless roundtrip (mono + stereo), word-aligned
    chunk walking, resample length math, corrupt bytes -> ValueError."""
    import numpy as np

    from bigdatabowl2024_25_spark.operators.media_av import (
        decode_wav,
        encode_wav,
        resample_wav,
    )

    t = np.arange(800)
    mono = (np.sin(t / 20.0) * 20000).astype(np.int16)
    stereo = np.stack([mono, -mono], axis=-1)
    for sig, ch in ((mono, 1), (stereo, 2)):
        enc = encode_wav(sig, 8000)
        arr, rate = decode_wav(enc)
        assert rate == 8000 and arr.shape == (800, ch)
        assert np.array_equal(arr, sig.reshape(800, ch))
    # extra chunk between fmt and data must be skipped (word-aligned)
    import struct

    enc = encode_wav(mono, 8000)
    fmt_end = enc.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = enc[:fmt_end] + extra + enc[fmt_end:]
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8
    ) + patched[8:]
    arr, rate = decode_wav(patched)
    assert np.array_equal(arr[:, 0], mono)
    # resample halves/doubles the sample count
    half = decode_wav(resample_wav(enc, 4000))
    assert half[1] == 4000 and half[0].shape[0] == 400
    dbl = decode_wav(resample_wav(enc, 16000))
    assert dbl[1] == 16000 and dbl[0].shape[0] == 1600
    import pytest as _pytest

    for bad in (b"RIFFxxxx", enc[:30], enc.replace(b"fmt ", b"fmx ", 1)):
        with _pytest.raises(ValueError):
            decode_wav(bad)


def test_avi_mjpeg_roundtrip_and_sampling():
    """MJPEG/AVI: container roundtrip preserves frame count/dims/fps;
    per-frame pixels match a bare JPEG roundtrip; frame sampling
    decodes only kept frames; corruption raises ValueError."""
    import numpy as np

    from bigdatabowl2024_25_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from bigdatabowl2024_25_spark.operators.media_av import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        sample_avi_frames,
    )

    yy, xx = np.mgrid[0:16, 0:24]
    frames = [
        np.stack([(xx * 9 + i * 31) % 256, (yy * 7) % 256, xx + yy],
                 axis=-1).astype(np.uint8)
        for i in range(6)
    ]
    avi = encode_avi_mjpeg(frames, fps=5, quality=85)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    dec, fps = decode_avi_mjpeg(avi)
    assert fps == 5 and len(dec) == 6
    for i, f in enumerate(dec):
        assert f.shape == (16, 24, 3)
        assert np.array_equal(f, decode_jpeg(encode_jpeg(frames[i], 85)))
    sampled = sample_avi_frames(avi, every_n=3)
    assert len(sampled) == 2
    assert np.array_equal(sampled[0], dec[0])
    assert np.array_equal(sampled[1], dec[3])
    import pytest as _pytest

    for bad in (b"RIFF\x00\x00\x00\x00WAVE", avi[: len(avi) // 2]):
        with _pytest.raises(ValueError):
            decode_avi_mjpeg(bad)


def test_spark_audio_video_paths(spark):
    """decode_audio / resample_audio / decode_video through the Arrow
    batch path: real codecs, coerce on corrupt rows."""
    import numpy as np

    from bigdatabowl2024_25_spark.operators.media_av import (
        decode_wav,
        encode_avi_mjpeg,
        encode_wav,
    )

    t = np.arange(400)
    wav = encode_wav((np.sin(t / 9.0) * 999).astype(np.int16), 8000)
    rows = [
        (0, "audio", wav, "synthetic"),
        (1, "audio", b"not audio", "synthetic"),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.decode_audio(df).collect()}
    assert (out[0].n_samples, out[0].sample_rate, out[0].ok) == (400, 8000, True)
    assert out[1].ok is False
    res = {r.media_id: r for r in multimodal.resample_audio(df, 4000).collect()}
    arr, rate = decode_wav(bytes(res[0].payload))
    assert rate == 4000 and arr.shape[0] == 200
    assert res[1].payload is None

    yy, xx = np.mgrid[0:8, 0:8]
    frames = [((xx * yy + i) % 256).astype(np.uint8) for i in range(4)]
    avi = encode_avi_mjpeg(frames, fps=2)
    vrows = [
        (0, "video", avi, "synthetic"),
        (1, "video", avi[:40], "synthetic"),
    ]
    vdf = spark.createDataFrame(vrows, multimodal.MEDIA_SCHEMA)
    vout = {r.media_id: r for r in multimodal.decode_video(vdf).collect()}
    assert (vout[0].n_frames, vout[0].width, vout[0].fps, vout[0].ok) == (
        4, 8, 2, True,
    )
    assert vout[1].ok is False
    sampled = {
        r.media_id: r
        for r in multimodal.decode_video(vdf, every_n=2).collect()
    }
    assert sampled[0].n_frames == 2


def test_dedup_stream_cross_batch(spark, tmp_path):
    """Streaming dedup must swallow re-deliveries that land in a
    DIFFERENT micro-batch than the original: a doubled subset of events
    split over several files must drain to exactly the batch-distinct
    set, and the raw (undeduped) stream must show the inflation."""
    from bigdatabowl2024_25_spark.sources.io import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts", "value"
    )
    dupes = events.filter(F.col("user_id") % 5 == 0)
    path = str(tmp_path / "dedup_src")
    events.unionByName(dupes).repartition(4).write.parquet(path)

    static = spark.read.parquet(path)
    n_raw = static.count()
    n_distinct = events.count()
    assert n_raw > n_distinct  # duplicates really planted

    clean = replay.dedup_stream(
        replay.stream_from_dir(spark, path, static.schema),
        keys=["event_id"],
    )
    replay.run_to_memory(clean, "dedup_test", mode="append")
    got = spark.table("dedup_test")
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct

    # watermarked production path (dropDuplicatesWithinWatermark).
    # The replay's files are RANDOM time slices, so a tight watermark
    # would advance past later batches and drop their rows as late
    # data (correct streaming semantics, wrong for a full-history
    # replay — verified: "1 hour" keeps only ~55%). A watermark wider
    # than the table's whole time span exercises the same operator
    # with nothing late: the drain must equal batch-distinct exactly.
    wm = replay.dedup_stream(
        replay.stream_from_dir(spark, path, static.schema),
        keys=["event_id"],
        ts_col="ts",
        watermark="3650 days",
    )
    replay.run_to_memory(wm, "dedup_wm_test", mode="append")
    assert spark.table("dedup_wm_test").count() == n_distinct


def test_fake_branches_coerce_null_payloads(spark):
    """Round-13 second-review fix: the 'fake' pseudo-decode branches
    of decode_media / resize_media and extract_features hash the
    payload with no try — an upstream-nulled payload must coerce to a
    null/ok=False row there too, not die on bytes(None)."""
    from bigdatabowl2024_25_spark.operators.multimodal import (
        decode_media,
        extract_features,
        resize_media,
    )

    df = spark.createDataFrame(
        [(0, b"some payload"), (1, None)],
        "media_id long, payload binary",
    )
    dec = {r.media_id: r for r in decode_media(df).collect()}
    assert dec[0].ok and dec[1].ok is False and dec[1].width is None
    rs = {r.media_id: r for r in resize_media(df, 16, 16).collect()}
    assert rs[0].payload is not None and rs[1].payload is None
    fe = {r.media_id: r for r in extract_features(df, dim=4).collect()}
    assert fe[0].features is not None and fe[1].features is None

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

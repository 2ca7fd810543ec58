"""Streaming anomaly flags == batch rolling_anomaly under in-order
replay — the stream/batch parity contract every stateful operator in
streaming/ carries, here with the integer-exact z-score rule."""

from __future__ import annotations

import pytest

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.windows import rolling_anomaly
from bigdatabowl2024_25_spark.sources.io import load_table
from bigdatabowl2024_25_spark.streaming import replay

N = 5


def test_streaming_anomaly_matches_batch(spark, tmp_path):
    events = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("user_id", "ts_us", "value")
        # unique (user, ts) rows so batch/stream tie order can't differ
        .dropDuplicates(["user_id", "ts_us"])
        .orderBy("ts_us")
        .limit(600)
    )
    rows = events.collect()
    path = tmp_path / "anom_src"
    path.mkdir()
    third = len(rows) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third if i < 2 else len(rows)]
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.parquet(
            str(path / f"b{i}")
        )
    flat = tmp_path / "flat"
    flat.mkdir()
    base = int(time.time())
    for i in range(3):
        (src,) = glob.glob(str(path / f"b{i}" / "part-*.parquet"))
        dst = flat / f"{i:02d}.parquet"
        shutil.copy(src, str(dst))
        os.utime(dst, (base + i, base + i))

    stream = replay.stream_from_dir(spark, str(flat), events.schema)
    replay.run_to_memory(
        replay.streaming_anomaly(stream, n=N),
        "anomaly_stream",
        mode="update",
    )
    got = {
        (r.user_id, r.ts_us): r.is_anomaly
        for r in spark.table("anomaly_stream").collect()
    }

    batch = {
        (r.user_id, r.ts_us): r.is_anomaly
        for r in rolling_anomaly(
            spark.createDataFrame(rows, events.schema),
            "value",
            ["user_id"],
            ["ts_us"],
            n=N,
        ).collect()
    }
    assert got == batch and len(got) == len(rows)
    # the rule must actually fire somewhere on this data; if not, the
    # parity above is vacuous
    assert any(got.values())


@pytest.mark.slow
def test_streaming_anomaly_null_values_and_overflow(spark, tmp_path):
    import pytest

    rows = [
        (1, 10, 1.0), (1, 20, 1.1), (1, 30, 0.9), (1, 40, 1.0),
        (1, 50, None), (1, 60, 1.05), (1, 70, 99.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, value double")
    src = tmp_path / "src"
    df.coalesce(1).write.parquet(str(src))
    stream = replay.stream_from_dir(spark, str(src), df.schema)
    replay.run_to_memory(
        replay.streaming_anomaly(stream, n=3),
        "anomaly_null_stream",
        mode="update",
    )
    got = {
        r.ts_us: r.is_anomaly
        for r in spark.table("anomaly_null_stream").collect()
    }
    want = {
        r.ts_us: r.is_anomaly
        for r in rolling_anomaly(
            df, "value", ["user_id"], ["ts_us"], n=3
        ).collect()
    }
    assert got == want
    # NULL occupies its window position: 99.0 at ts 70 has a NULL in
    # its trailing 3 rows -> c < n -> NOT flagged (both engines)
    assert got[70] is False and got[50] is False

    # overflow raises loudly, mirroring the batch assert_true guard
    big = spark.createDataFrame(
        [(1, 10 + i, 1.0) for i in range(3)] + [(1, 99, 1e25)],
        "user_id long, ts_us long, value double",
    )
    src2 = tmp_path / "src2"
    big.coalesce(1).write.parquet(str(src2))
    stream2 = replay.stream_from_dir(spark, str(src2), big.schema)
    with pytest.raises(Exception, match="streaming_anomaly"):
        replay.run_to_memory(
            replay.streaming_anomaly(stream2, n=3),
            "anomaly_overflow_stream",
            mode="update",
        )


@pytest.mark.slow
def test_streaming_cusum_matches_batch(spark, tmp_path):
    from bigdatabowl2024_25_spark.operators.windows import cusum_flags

    events = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("user_id", "ts_us", "value")
        .dropDuplicates(["user_id", "ts_us"])
        .orderBy("ts_us")
        .limit(600)
    )
    rows = events.collect()
    path = tmp_path / "cusum_src"
    path.mkdir()
    third = len(rows) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third if i < 2 else len(rows)]
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.parquet(
            str(path / f"b{i}")
        )
    flat = tmp_path / "cusum_flat"
    flat.mkdir()
    base = int(time.time())
    for i in range(3):
        (src,) = glob.glob(str(path / f"b{i}" / "part-*.parquet"))
        dst = flat / f"{i:02d}.parquet"
        shutil.copy(src, str(dst))
        os.utime(dst, (base + i, base + i))

    K, H = 50_000_000, 200_000_000
    stream = replay.stream_from_dir(spark, str(flat), events.schema)
    replay.run_to_memory(
        replay.streaming_cusum(stream, k_scaled=K, h_scaled=H),
        "cusum_stream",
        mode="update",
    )
    got = {
        (r.user_id, r.ts_us): r.cusum_flag
        for r in spark.table("cusum_stream").collect()
    }
    batch = {
        (r.user_id, r.ts_us): r.cusum_flag
        for r in cusum_flags(
            spark.createDataFrame(rows, events.schema),
            "value",
            ["user_id"],
            ["ts_us"],
            k_scaled=K,
            h_scaled=H,
        ).collect()
    }
    assert got == batch and len(got) == len(rows)
    assert "up" in got.values() or "down" in got.values()


@pytest.mark.slow
def test_streaming_cusum_null_pause(spark, tmp_path):
    """A NULL value pauses the series without resetting drift state —
    the post-NULL row must still see the accumulated prefix sum."""
    rows = [(1, 10, 2.0), (1, 20, 2.0), (1, 30, None), (1, 40, 2.0)]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, value double")
    src = tmp_path / "cu_null"
    df.coalesce(1).write.parquet(str(src))
    stream = replay.stream_from_dir(spark, str(src), df.schema)
    replay.run_to_memory(
        replay.streaming_cusum(stream, k_scaled=1_000_000, h_scaled=2_500_000),
        "cusum_null_stream",
        mode="update",
    )
    got = {
        r.ts_us: r.cusum_flag
        for r in spark.table("cusum_null_stream").collect()
    }
    # +1.0 drift per non-null row vs h=2.5: trips on the THIRD
    # non-null row (t=40) — only if the NULL at t=30 kept the state
    assert got == {10: None, 20: None, 30: None, 40: "up"}

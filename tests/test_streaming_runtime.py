"""Round-15 VERDICT item 4: drive the streaming twins' STATE-STORE
claims through the runtime surfaces only a real micro-batch executor
exercises — not just a single availableNow drain (which every
streaming test already does), but:

1. **Checkpoint restart** — applyInPandasWithState state must survive
   the death of the query: drain half the fixture, STOP, append more
   files, start a NEW query on the SAME checkpoint. The second run
   must (a) process only the new files (source WAL) and (b) resume
   per-key running totals from the state store, finishing equal to
   the batch aggregate over the full data. This is the state-store
   LIFETIME property the 100 TB story depends on (a long-running
   ingest is restarted constantly) and no single-drain test can
   observe it.
2. **Append-mode watermark eviction** — tumbling_counts under a real
   watermark in APPEND mode emits a window only once the watermark
   passes its end; with a per-stream flush row the emitted set must
   equal the batch aggregate exactly (minus the flush window), and
   WITHOUT the flush the trailing windows must be withheld — pinning
   the documented late-data/flush policy against the actual executor
   instead of the docstring.

Sinks are foreachBatch→parquet (restart-safe; the memory sink is
explicitly NOT fault-tolerant and cannot witness recovery).

File construction mirrors test_streaming_funnel: one parquet file per
micro-batch, mtimes pinned because the file source replays in
modification-time order.
"""

from __future__ import annotations

import pytest

import glob
import os
import shutil
import time

from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.sources.io import load_table
from bigdatabowl2024_25_spark.streaming import replay


def _write_file(spark, stage_dir, flat_dir, df, seq: int) -> None:
    staged = stage_dir / f"b{seq}"
    df.coalesce(1).write.parquet(str(staged))
    (src,) = glob.glob(str(staged / "part-*.parquet"))
    dst = flat_dir / f"{seq:02d}.parquet"
    shutil.copy(src, str(dst))
    base = int(time.time())
    os.utime(dst, (base + seq, base + seq))


@pytest.mark.slow
def test_stateful_totals_survive_checkpoint_restart(spark, tmp_path):
    events = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "ts_us", "user_id", "value")
        # integer-valued doubles: float running sums become exact, so
        # stream==batch can be compared with == instead of tolerances
        .withColumn("value", F.round(F.col("value")))
        .limit(400)
    )
    rows = events.collect()
    quarter = len(rows) // 4
    batches = [
        rows[i * quarter : (i + 1) * quarter if i < 3 else len(rows)]
        for i in range(4)
    ]
    flat = tmp_path / "src"
    flat.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain() -> None:
        static_schema = events.schema
        stream = replay.stream_from_dir(spark, str(flat), static_schema)
        totals = replay.stateful_running_totals(stream)

        def write_batch(bdf, batch_id):
            bdf.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(sink)

        q = (
            totals.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: first two files
    for i in range(2):
        _write_file(spark, tmp_path, flat, spark.createDataFrame(
            batches[i], events.schema), i)
    drain()
    mid = spark.read.parquet(sink)
    n_mid_batches = mid.select("batch_id").distinct().count()
    assert n_mid_batches >= 2  # maxFilesPerTrigger=1 → one per file
    # run 2: two more files, NEW query object, SAME checkpoint
    for i in range(2, 4):
        _write_file(spark, tmp_path, flat, spark.createDataFrame(
            batches[i], events.schema), i)
    drain()
    out = spark.read.parquet(sink).collect()
    # batch ids must CONTINUE, not restart — the checkpoint's source
    # WAL means run 2 never re-reads run 1's files
    assert {r.batch_id for r in out} > {r.batch_id for r in mid.collect()}
    # final per-key state: n_events is monotone per key, so max picks
    # the last emission regardless of run/batch interleaving
    final: dict[int, tuple[int, float]] = {}
    for r in out:
        cur = final.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            final[r.user_id] = (r.n_events, r.total_value)
    expected = {
        r.user_id: (r.n, r.total)
        for r in spark.createDataFrame(rows, events.schema)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert final == expected and len(expected) > 0


def _window_counts_batch(df, width_us: int):
    """Batch twin of tumbling_counts over ts_us micros (exact ints)."""
    return {
        (r.w, r.user_id): (r.n, r.s)
        for r in df.groupBy(
            (F.floor(F.col("ts_us") / width_us) * width_us).alias("w"),
            "user_id",
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }


@pytest.mark.slow
def test_append_mode_watermark_eviction(spark, tmp_path):
    """Append mode + watermark against the REAL executor: windows are
    emitted exactly once their end falls behind the watermark, a
    flush row drains everything, and without it the tail is withheld
    (the documented flush requirement, observed not asserted)."""
    events = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("ts", "ts_us", "user_id", "value")
        .withColumn("value", F.round(F.col("value")))
        .orderBy("ts_us")
        .limit(300)
    )
    rows = events.collect()
    third = len(rows) // 3
    flat = tmp_path / "src"
    flat.mkdir()
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third if i < 2 else len(rows)]
        _write_file(spark, tmp_path, flat, spark.createDataFrame(
            chunk, events.schema), i)
    # without a flush: the trailing windows (inside the final
    # watermark) must be WITHHELD in append mode
    stream = replay.stream_from_dir(spark, str(flat), events.schema)
    agg = replay.tumbling_counts(
        stream, ts_col="ts", key="user_id",
        width="10 seconds", watermark="30 seconds", sum_cast=None,
    ).select(
        F.unix_micros(F.col("window.start")).alias("w"),
        "user_id", "n_events", "sum_value",
    )
    replay.run_to_memory(agg, "wm_nofl", mode="append")
    got_nofl = spark.table("wm_nofl").collect()
    batch = _window_counts_batch(
        spark.createDataFrame(rows, events.schema), 10_000_000
    )
    assert 0 < len(got_nofl) < len(batch)  # tail withheld, rest out
    for r in got_nofl:
        assert batch[(r.w, r.user_id)] == (r.n_events, r.sum_value)
    # with a far-future flush row per stream: every real window is
    # past the watermark by end-of-replay → emitted set == batch agg
    max_ts = max(r.ts for r in rows)
    import datetime

    flush = [(
        max_ts + datetime.timedelta(hours=1),
        rows[0].ts_us + 3_600_000_000,
        -1, 0.0,
    )]
    _write_file(spark, tmp_path, flat, spark.createDataFrame(
        flush, events.schema), 3)
    stream2 = replay.stream_from_dir(spark, str(flat), events.schema)
    agg2 = replay.tumbling_counts(
        stream2, ts_col="ts", key="user_id",
        width="10 seconds", watermark="30 seconds", sum_cast=None,
    ).select(
        F.unix_micros(F.col("window.start")).alias("w"),
        "user_id", "n_events", "sum_value",
    )
    replay.run_to_memory(agg2, "wm_fl", mode="append")
    got = {
        (r.w, r.user_id): (r.n_events, r.sum_value)
        for r in spark.table("wm_fl").collect()
        if r.user_id != -1  # the flush row's own window
    }
    # window starts: the streaming window aligns to epoch like floor()
    batch_by_start = {
        (k[0], k[1]): v for k, v in batch.items()
    }
    assert got == batch_by_start

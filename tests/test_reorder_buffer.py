"""Watermark reorder buffer for order-sensitive streaming ops
(round-11 VERDICT item 2): shuffled arrival + reorder_delay_us must
equal the batch operator; later-than-delay rows drop instead of
corrupting greedy state.

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

from bigdatabowl2024_25_spark.streaming import replay
from bigdatabowl2024_25_spark.streaming.replay import _reorder_step

STEPS = ["view", "click", "purchase"]


def _write_batches(spark, tmp_path, schema_str, batches):
    """Write each row-list as one parquet file with strictly
    increasing mtimes; returns the replay dir + schema."""
    flat = tmp_path / "flat"
    flat.mkdir()
    base = int(time.time())
    schema = None
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema_str)
        schema = df.schema
        staged = tmp_path / f"b{i}"
        df.coalesce(1).write.parquet(str(staged))
        (src,) = glob.glob(str(staged / "part-*.parquet"))
        dst = flat / f"{i:02d}.parquet"
        shutil.copy(src, str(dst))
        os.utime(dst, (base + i, base + i))
    return str(flat), schema


def test_reorder_step_unit():
    """The pure helper: buffering, event-time release order, per-key
    watermark advance, late-beyond-delay drops, tie-break on payload
    with None first."""
    # batch 1: disorder within delay — nothing late, holds the tail
    rel, buf, seen, late = _reorder_step([], -1, [(30, "c"), (10, "a")], 15)
    assert late == 0 and seen == 30
    assert rel == [(10, "a")] and buf == [(30, "c")]
    # batch 2: a row older than the previous watermark (15) is late
    rel, buf, seen, late = _reorder_step(
        buf, seen, [(12, "x"), (20, "b"), (60, "z")], 15
    )
    assert late == 1  # ts=12 <= 30-15
    assert rel == [(20, "b"), (30, "c")] and buf == [(60, "z")]
    assert seen == 60
    # ties release None-payload first, then payload order
    rel, _, _, _ = _reorder_step(
        [], -1, [(5, "b"), (5, None), (5, "a"), (99, "w")], 0
    )
    assert rel == [(5, None), (5, "a"), (5, "b"), (99, "w")]
    # empty stream: sentinel untouched, nothing released
    assert _reorder_step([], -1, [], 10) == ([], [], -1, 0)


def test_reorder_step_boundaries():
    """Round-12 edge audit (VERDICT item 6): pin the delay_us=0
    degenerate case and the ts-exactly-at-watermark boundaries on
    both sides (release is <=, lateness is <= the PREVIOUS
    watermark)."""
    # delay 0: watermark == max_seen, so every first-batch row
    # releases immediately in event-time order, nothing buffers
    rel, buf, seen, late = _reorder_step([], -1, [(10, "a"), (30, "c")], 0)
    assert rel == [(10, "a"), (30, "c")] and buf == [] and seen == 30
    # delay 0, next batch: ts EQUAL to the previous watermark (30) is
    # late (processing already advanced past that slot); strictly
    # newer rows pass straight through
    rel, buf, seen, late = _reorder_step(
        buf, seen, [(30, "dup"), (31, "d")], 0
    )
    assert late == 1 and rel == [(31, "d")] and buf == [] and seen == 31
    # ts exactly AT the new watermark releases (<=, not <): with
    # max_seen=100 and delay=15, wm=85 and the ts=85 row goes out
    rel, buf, seen, late = _reorder_step([], -1, [(100, "z"), (85, "y")], 15)
    assert rel == [(85, "y")] and buf == [(100, "z")] and late == 0
    # ts exactly AT the previous watermark is late; one past it
    # buffers (and nothing releases — the watermark didn't advance)
    rel, buf, seen, late = _reorder_step(
        buf, seen, [(85, "late"), (86, "ok")], 15
    )
    assert late == 1 and rel == [] and seen == 100
    assert buf == [(86, "ok"), (100, "z")]


@pytest.mark.slow
def test_streaming_funnel_out_of_order_matches_batch(spark, tmp_path):
    """Steps arrive REVERSED across micro-batches (purchase+click
    before view). Without the buffer greedy state can only take
    'view' (reached=1); with reorder_delay_us covering the disorder
    the final state equals the batch operator (reached=3). A per-user
    flush event (type outside the steps, far-future ts) advances the
    per-key watermark past the real rows; it is itself never
    released."""
    from bigdatabowl2024_25_spark.operators.funnel import funnel_steps

    real = []
    for u in (1, 2, 3):
        real += [
            (u, 10 + u, "view"),
            (u, 20 + u, "click"),
            (u, 30 + u, "purchase"),
        ]
    late_arrivals = [(u, 20 + u, "click") for u in (1, 2, 3)] + [
        (u, 30 + u, "purchase") for u in (1, 2, 3)
    ]
    first = [(u, 10 + u, "view") for u in (1, 2, 3)]
    flush = [(u, 10_000, "noop") for u in (1, 2, 3)]
    batches = [late_arrivals, first, flush]
    schema_str = "user_id long, ts_us long, event_type string"
    flat, schema = _write_batches(spark, tmp_path, schema_str, batches)

    ordered = replay.streaming_funnel(
        replay.stream_from_dir(spark, flat, schema),
        STEPS,
        reorder_delay_us=1_000,
    )
    replay.run_to_memory(ordered, "ooo_funnel", mode="update")
    final = {}
    for r in spark.table("ooo_funnel").collect():
        cur = final.get(r.user_id)
        if cur is None or r.reached >= cur[3]:
            final[r.user_id] = (r.t0, r.t1, r.t2, r.reached)

    batch = {
        r.user_id: (r.t0, r.t1, r.t2, r.reached)
        for r in funnel_steps(
            spark.createDataFrame(real, schema_str),
            "user_id", "ts_us", "event_type", STEPS,
        ).collect()
    }
    assert final == batch
    assert all(v[3] == 3 for v in final.values())

    # control: the SAME shuffled files without the buffer can only
    # ever take step 0 — which is exactly why the buffer exists
    legacy = replay.streaming_funnel(
        replay.stream_from_dir(spark, flat, schema), STEPS
    )
    replay.run_to_memory(legacy, "ooo_funnel_legacy", mode="update")
    worst = {}
    for r in spark.table("ooo_funnel_legacy").collect():
        cur = worst.get(r.user_id)
        if cur is None or r.reached >= cur:
            worst[r.user_id] = r.reached
    assert all(v == 1 for v in worst.values())


@pytest.mark.slow
def test_streaming_funnel_late_beyond_delay_drops(spark, tmp_path):
    """A row older than the already-advanced watermark is dropped —
    never inserted behind processed state. view@100 and purchase@200
    release in batch 1 (wm=200); click@120 arrives after and is late
    → the funnel stays at reached=1 (purchase was unreachable without
    click; click can no longer be taken)."""
    schema_str = "user_id long, ts_us long, event_type string"
    batches = [
        [(1, 100, "view"), (1, 200, "purchase"), (1, 250, "noop")],
        [(1, 120, "click")],
        [(1, 10_000, "noop")],
    ]
    flat, schema = _write_batches(spark, tmp_path, schema_str, batches)
    q = replay.streaming_funnel(
        replay.stream_from_dir(spark, flat, schema),
        STEPS,
        reorder_delay_us=50,
    )
    replay.run_to_memory(q, "late_funnel", mode="update")
    last = max(
        spark.table("late_funnel").collect(), key=lambda r: r.reached
    )
    assert (last.t0, last.t1, last.t2, last.reached) == (100, None, None, 1)


def test_streaming_cusum_out_of_order_matches_batch(spark, tmp_path):
    """CUSUM's running extrema are un-reorderable, so shuffled arrival
    without the buffer corrupts flags; with it, per-row flags equal
    the batch operator bit-for-bit. Uses an INCREMENTAL delay (smaller
    than the full span) so rows release across several batches, not
    in one final sort."""
    from bigdatabowl2024_25_spark.operators.windows import cusum_flags

    K, H = 1_000_000, 3_000_000  # k=1.0, h=3.0 in micro-units
    vals = [5.0, 5.0, 9.0, 9.0, 1.0, 1.0, 9.0, 9.0, 5.0, 9.0]
    real = [(1, (i + 1) * 10, v) for i, v in enumerate(vals)]
    # pairwise swap arrival order within each file; files in order
    b0 = [real[1], real[0], real[3], real[2]]
    b1 = [real[5], real[4], real[7], real[6]]
    b2 = [real[9], real[8]]
    flush = [(1, 10_000, None)]
    schema_str = "user_id long, ts_us long, value double"
    flat, schema = _write_batches(
        spark, tmp_path, schema_str, [b0, b1, b2, flush]
    )
    q = replay.streaming_cusum(
        replay.stream_from_dir(spark, flat, schema),
        k_scaled=K, h_scaled=H,
        reorder_delay_us=25,
    )
    replay.run_to_memory(q, "ooo_cusum", mode="update")
    got = {
        (r.user_id, r.ts_us): r.cusum_flag
        for r in spark.table("ooo_cusum").collect()
    }
    want = {
        (r.user_id, r.ts_us): r.cusum_flag
        for r in cusum_flags(
            spark.createDataFrame(real, schema_str),
            "value", ["user_id"], ["ts_us"],
            k_scaled=K, h_scaled=H,
        ).collect()
    }
    assert got == want
    assert len(got) == len(real)  # flush row never emits
    assert any(v is not None for v in got.values())


@pytest.mark.slow
def test_streaming_anomaly_out_of_order_matches_batch(spark, tmp_path):
    """The rolling-anomaly twin under the same shuffled replay: flags
    equal the batch operator once the buffer restores event-time
    order."""
    from bigdatabowl2024_25_spark.operators.windows import rolling_anomaly

    vals = [5.0, 5.1, 4.9, 5.0, 5.1, 50.0, 5.0, 4.8, 5.2, 5.0]
    real = [(1, (i + 1) * 10, v) for i, v in enumerate(vals)]
    b0 = [real[2], real[0], real[1]]
    b1 = [real[5], real[3], real[4]]
    b2 = [real[8], real[9], real[6], real[7]]
    flush = [(1, 10_000, None)]
    schema_str = "user_id long, ts_us long, value double"
    flat, schema = _write_batches(
        spark, tmp_path, schema_str, [b0, b1, b2, flush]
    )
    q = replay.streaming_anomaly(
        replay.stream_from_dir(spark, flat, schema),
        n=5, reorder_delay_us=40,
    )
    replay.run_to_memory(q, "ooo_anom", mode="update")
    got = {
        (r.user_id, r.ts_us): r.is_anomaly
        for r in spark.table("ooo_anom").collect()
    }
    want = {
        (r.user_id, r.ts_us): r.is_anomaly
        for r in rolling_anomaly(
            spark.createDataFrame(real, schema_str),
            "value", ["user_id"], ["ts_us"], n=5,
        ).collect()
    }
    assert got == want
    assert len(got) == len(real)
    assert got[(1, 60)] is True  # the planted 50.0 spike


def test_reorder_step_rejects_null_and_negative_ts():
    """Loud guards, not silent corruption: NULL event times cannot be
    ordered, and a NEGATIVE one sits below the max_seen=-1 sentinel —
    the watermark would never advance and the key's rows would buffer
    forever without emitting."""
    import pytest

    with pytest.raises(ValueError, match="NULL event time"):
        _reorder_step([], -1, [(None, "a")], 10)
    with pytest.raises(ValueError, match="NULL event time"):
        _reorder_step([], -1, [(float("nan"), "a")], 10)
    with pytest.raises(ValueError, match="negative event time"):
        _reorder_step([], -1, [(-5, "a")], 10)


def test_streaming_ops_reject_null_event_time(spark, tmp_path):
    """All three order-sensitive streaming ops fail LOUDLY on a NULL
    event time (previously int(NaN) raised a cryptic numpy error
    mid-executor) — on both the legacy in-order path and the reorder
    path."""
    import pytest

    schema_str = "user_id long, ts_us bigint, event_type string"
    batches = [[(1, 100, "view"), (1, None, "click")]]
    flat, schema = _write_batches(spark, tmp_path, schema_str, batches)
    for kwargs in ({}, {"reorder_delay_us": 10}):
        q = replay.streaming_funnel(
            replay.stream_from_dir(spark, flat, schema), STEPS, **kwargs
        )
        with pytest.raises(Exception, match="NULL event time"):
            replay.run_to_memory(
                q, f"null_ts_{len(kwargs)}", mode="update"
            )

    vschema_str = "user_id long, ts_us bigint, value double"
    vbatches = [[(1, 100, 1.0), (1, None, 2.0)]]
    (tmp_path / "v").mkdir()
    vflat, vschema = _write_batches(
        spark, tmp_path / "v", vschema_str, vbatches
    )
    with pytest.raises(Exception, match="NULL event time"):
        replay.run_to_memory(
            replay.streaming_cusum(
                replay.stream_from_dir(spark, vflat, vschema),
                k_scaled=0, h_scaled=10**6,
            ),
            "null_ts_cusum",
            mode="update",
        )
    with pytest.raises(Exception, match="NULL event time"):
        replay.run_to_memory(
            replay.streaming_anomaly(
                replay.stream_from_dir(spark, vflat, vschema), n=2
            ),
            "null_ts_anom",
            mode="update",
        )

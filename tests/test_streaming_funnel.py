"""Streaming funnel == batch funnel under in-order replay.

The stateful op (`replay.streaming_funnel`) drains 3 time-ordered
micro-batches; the final emission per user must equal
`funnel.funnel_steps` over the full data — the stream/batch parity
contract every stateful operator in streaming/ carries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.funnel import funnel_steps
from bigdatabowl2024_25_spark.sources.io import load_table
from bigdatabowl2024_25_spark.streaming import replay

STEPS = ["view", "click", "purchase"]


def test_streaming_funnel_matches_batch(spark, tmp_path):
    events = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("user_id", "ts_us", "event_type")
        .orderBy("ts_us")
    )
    rows = events.collect()
    path = tmp_path / "funnel_src"
    path.mkdir()
    third = len(rows) // 3
    # three time-ordered files, written sequentially so the replay
    # source (one file per trigger, mod-time order) preserves order
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third if i < 2 else len(rows)]
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.parquet(
            str(path / f"b{i}")
        )
    import glob
    import os
    import shutil
    import time

    flat = tmp_path / "flat"
    flat.mkdir()
    base = int(time.time())
    for i in range(3):
        (src,) = glob.glob(str(path / f"b{i}" / "part-*.parquet"))
        dst = flat / f"{i:02d}.parquet"
        shutil.copy(src, str(dst))
        # the file source replays in MODIFICATION-TIME order; back-to-
        # back copies can tie on mtime and the tie-break may invert the
        # batches, violating streaming_funnel's documented in-order
        # precondition — pin strictly increasing mtimes explicitly
        os.utime(dst, (base + i, base + i))

    stream = replay.stream_from_dir(spark, str(flat), events.schema)
    replay.run_to_memory(
        replay.streaming_funnel(stream, STEPS, ts_col="ts_us"),
        "funnel_stream",
        mode="update",
    )
    got_rows = spark.table("funnel_stream").collect()
    final = {}
    for r in got_rows:  # last emission per user = most steps reached
        cur = final.get(r.user_id)
        if cur is None or r.reached >= cur[3]:
            final[r.user_id] = (r.t0, r.t1, r.t2, r.reached)

    batch = {
        r.user_id: (r.t0, r.t1, r.t2, r.reached)
        for r in funnel_steps(
            spark.createDataFrame(rows, events.schema),
            "user_id",
            "ts_us",
            "event_type",
            STEPS,
        ).collect()
    }
    # streaming emits every user it saw; batch only users with step 0.
    stream_reached = {
        u: v for u, v in final.items() if v[3] > 0
    }
    assert stream_reached == batch and len(batch) > 0

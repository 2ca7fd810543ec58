"""Parity query: the Structured Streaming slice (SURVEY.md §2.10),
driver-verified.

q93 runs a REAL streaming job inside the query callable: the events
table is re-partitioned into multiple parquet files in a temp dir,
replayed through `readStream` (one file per micro-batch), aggregated
with the tumbling-window operator (`streaming/replay.py
tumbling_counts`, the secondId bucketing of `BuildingReadOrder.R:32-36`
as a streaming aggregate), and drained to completion with an
availableNow trigger into a memory sink. Complete-mode output over a
fully-drained stream equals the batch aggregate BY CONSTRUCTION
(count/decimal-sum are order-free), so the DuckDB oracle is the plain
batch SQL — which is exactly the stream==batch equivalence the local
pytest pins, now surfaced as a CORRECTNESS row instead of being
driver-invisible (round-4 VERDICT item 7).

Window starts are projected as epoch micros (`unix_micros` on the
window struct's LTZ bound), never raw timestamps, so the driver's
unknown session timezone cannot perturb the hash.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from ..sources.io import load_table
from ..streaming.replay import stream_from_dir, tumbling_counts
from .registry import query
from .stable import DEC

#: tumbling width: 10 s of event time, expressed in both engines
_W_US = 10_000_000


@query(
    "q93_streaming_tumbling",
    oracle=f"""
    SELECT user_id,
           (epoch_us(ts) // {_W_US}) * {_W_US} AS win_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q93_streaming_tumbling(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    )
    with tempfile.TemporaryDirectory() as tmp:
        # 4 files ⇒ 4 micro-batches: the stream genuinely crosses
        # batch boundaries, which is what makes the equivalence worth
        # checking (a 1-batch replay would be batch mode in disguise)
        events.repartition(4).write.parquet(f"{tmp}/in")
        stream = stream_from_dir(
            spark, f"{tmp}/in", spark.read.parquet(f"{tmp}/in").schema
        )
        agg = tumbling_counts(
            stream, ts_col="ts", key="user_id", width="10 seconds",
            watermark=None, sum_cast=DEC,
        )
        name = f"q93_mem_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.table(name)
            .select(
                "user_id",
                F.unix_micros(F.col("window.start")).alias("win_start_us"),
                "n_events",
                "sum_value",
            )
            # the memory sink table is driver-resident and tiny (one
            # row per user×window); localCheckpoint pins the rows so
            # the temp dir and memory sink can be torn down
            .localCheckpoint()
        )
        q.stop()
    return out

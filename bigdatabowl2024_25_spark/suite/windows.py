"""Parity queries: window operators (SURVEY.md §2.5, W1-W12).

The reference's signature pattern — partition by (gameId, playId),
order by frameId — maps here to partition by user_id, order by event
time. `events.ts` exits only as epoch micros (`ts_us`), never as a raw
timestamp; all orderings are made total with the unique event_id so
window results are deterministic under any partitioning.

Float note: running sums go through decimal casts (see stable.py) —
DuckDB evaluates window sums with a segment tree whose association
order differs from Spark's running fold, so double sums would drift.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.windows import (
    dense_rank_id,
    event_anchored_range,
    event_time_window_filter,
    filter_to_group_extremes,
    filter_to_group_min,
    group_min_offset,
    row_number_by,
    stable_label,
)
from ..sources.io import load_table
from .registry import query

DEC = "decimal(25,6)"


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@query(
    "q20_event_second_id",
    oracle="""
    SELECT event_id, user_id,
           DENSE_RANK() OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) - 1
             AS second_id
    FROM events
    """,
)
def q20_event_second_id(spark, sf_dir):
    """W1: `mutate(secondId = dense_rank(frameId) - 1)` per play
    (`radius_model.R:257-261`)."""
    e = _events(spark, sf_dir)
    return dense_rank_id(
        e, ["user_id"], ["ts_us"], "second_id"
    ).select("event_id", "user_id", "second_id")


@query(
    "q21_running_value",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS {DEC})) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS cum_value
    FROM events
    """,
)
def q21_running_value(spark, sf_dir):
    """W2: per-play cumulative distance (`BuildingReadOrder.R:88-94`).
    Decimal-stabilized so the running fold is order-exact."""
    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("cum_value"),
    )


@query(
    "q22_first_crossing_reads",
    oracle=f"""
    WITH cum AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               CAST(SUM(CAST(value AS {DEC})) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS cum_value
        FROM events
    )
    SELECT user_id,
           MIN(CASE WHEN cum_value >= 1000.0 THEN ts_us END) AS first_read_us,
           MIN(CASE WHEN cum_value >= 1000.0 THEN ts_us END) + 5000000
             AS second_read_us,
           MIN(CASE WHEN cum_value >= 1000.0 THEN ts_us END) + 20000000
             AS fifth_read_us
    FROM cum GROUP BY user_id
    """,
)
def q22_first_crossing_reads(spark, sf_dir):
    """W3 + W11: first frame where cumulative distance crosses the
    dropback target (`BuildingReadOrder.R:97-106`), then fixed 0.5 s
    read-cadence offsets (`BuildingReadOrder.R:116-122`) — here 5 s
    steps in micros."""
    e = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = e.select(
        "user_id",
        "ts_us",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("cum_value"),
    )
    first = F.min(F.when(F.col("cum_value") >= 1000.0, F.col("ts_us")))
    return cum.groupBy("user_id").agg(
        first.alias("first_read_us"),
        (first + 5_000_000).alias("second_read_us"),
        (first + 20_000_000).alias("fifth_read_us"),
    )


@query(
    "q23_time_offset",
    oracle="""
    SELECT event_id,
           epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id)
             AS adj_time_us
    FROM events
    """,
)
def q23_time_offset(spark, sf_dir):
    """W4: `adj_time = x - min(frameId)` per play
    (`BuildingReadOrder.R:108-111`)."""
    e = _events(spark, sf_dir)
    return group_min_offset(
        e, ["user_id"], "ts_us", "ts_us", "adj_time_us"
    ).select("event_id", "adj_time_us")


@query(
    "q24_first_event_per_user",
    oracle="""
    SELECT event_id, user_id, event_type FROM (
        SELECT event_id, user_id, event_type,
               epoch_us(ts) AS t,
               MIN(epoch_us(ts)) OVER (PARTITION BY user_id) AS mn
        FROM events
    ) WHERE t = mn
    """,
)
def q24_first_event_per_user(spark, sf_dir):
    """W5: `filter(frameId == min(frameId))` per play — the snap frame
    (`BuildingReadOrder.R:128-130`)."""
    e = _events(spark, sf_dir)
    return filter_to_group_min(e, ["user_id"], "ts_us").select(
        "event_id", "user_id", "event_type"
    )


@query(
    "q25_extreme_value_events",
    oracle="""
    SELECT event_id, user_id, value,
           CASE WHEN value = mn THEN 'L' ELSE 'R' END AS side
    FROM (
        SELECT event_id, user_id, value,
               MIN(value) OVER (PARTITION BY user_id) AS mn,
               MAX(value) OVER (PARTITION BY user_id) AS mx
        FROM events
    ) WHERE value = mn OR value = mx
    """,
)
def q25_extreme_value_events(spark, sf_dir):
    """W6: `filter(y == min(y) | y == max(y))` → outside receivers, then
    `firstSide = ifelse(y==min(y),"L","R")` (`BuildingReadOrder.R:133-137`)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id")
    out = filter_to_group_extremes(e, ["user_id"], "value")
    return out.withColumn(
        "side",
        F.when(F.col("value") == F.min("value").over(w), "L").otherwise("R"),
    ).select("event_id", "user_id", "value", "side")


@query(
    "q26_top_event_per_user",
    oracle="""
    SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY value DESC, event_id ASC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q26_top_event_per_user(spark, sf_dir):
    """W7/O3: per-group argmax with ties broken deterministically —
    `slice_max(open_count, n=1, with_ties=FALSE)` (`QBReadStats.R:182-184`)."""
    from ..operators.windows import argmax_row

    e = _events(spark, sf_dir)
    return argmax_row(
        e, ["user_id"], [F.col("value").desc(), F.col("event_id").asc()]
    ).select("user_id", "event_id", "value")


@query(
    "q27_conditional_read_order",
    oracle="""
    SELECT user_id, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY CASE WHEN user_id % 2 = 0 THEN -value ELSE value END,
                        event_id) AS read_order
    FROM events
    """,
)
def q27_conditional_read_order(spark, sf_dir):
    """W8: row_number over a conditional sort key — `arrange(...,
    if_else(firstSide=="R", -y, y))` (`BuildingReadOrder.R:151-157`)."""
    e = _events(spark, sf_dir)
    key = F.when(F.col("user_id") % 2 == 0, -F.col("value")).otherwise(
        F.col("value")
    )
    return row_number_by(
        e, ["user_id"], [key, F.col("event_id")], "read_order"
    ).select("user_id", "event_id", "read_order")


@query(
    "q28_daily_label",
    oracle="""
    SELECT event_id,
           ROW_NUMBER() OVER (
               PARTITION BY user_id, epoch_us(ts) // 86400000000
               ORDER BY epoch_us(ts), event_id) AS label
    FROM events
    """,
)
def q28_daily_label(spark, sf_dir):
    """W9: stable positional labeling — the reference recycles physical
    row order for defender labels 1..11
    (`Openness_Data_Frame_Prep.R:34-36`); we label per (user, day) by
    an explicit key. Day boundary via integer epoch math: timezone-free."""
    e = _events(spark, sf_dir).withColumn(
        "day", F.expr("ts_us div 86400000000")
    )
    return stable_label(
        e, ["user_id", "day"], ["ts_us", "event_id"], "label"
    ).select("event_id", "label")


@query(
    "q29_post_signup_window",
    oracle="""
    SELECT event_id, user_id, event_type FROM (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS t,
               MAX(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
                   OVER (PARTITION BY user_id) AS anchor
        FROM events
    ) WHERE t BETWEEN anchor + 2000000 AND anchor + 7000000
    """,
)
def q29_post_signup_window(spark, sf_dir):
    """W10: event-anchored offsets — ball rows x+2..x+7 after
    `pass_forward` (`Openness_Data_Frame_Prep.R:70-74`), as within-group
    time offsets (2-7 s after last signup)."""
    e = _events(spark, sf_dir)
    return event_anchored_range(
        e,
        ["user_id"],
        event_col="event_type",
        event_value="signup",
        frame_col="ts_us",
        lo_offset=2_000_000,
        hi_offset=7_000_000,
    ).select("event_id", "user_id", "event_type")


@query(
    "q30_session_slice",
    oracle="""
    SELECT event_id, user_id FROM (
        SELECT event_id, user_id, epoch_us(ts) AS t,
               MAX(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
                   OVER (PARTITION BY user_id) AS t0,
               MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                   OVER (PARTITION BY user_id) - 2000000 AS t1
        FROM events
    ) WHERE t BETWEEN t0 AND t1
    """,
)
def q30_session_slice(spark, sf_dir):
    """W12: the line_set ≤ t ≤ ball_snap − 2 s per-play filter that the
    reference runs as a per-group Python loop (`DefPosModel.ipynb`
    cell 1) — pure window expression, zero driver round-trips."""
    e = _events(spark, sf_dir)
    return event_time_window_filter(
        e,
        ["user_id"],
        ts_col="ts_us",
        start_cond=F.col("event_type") == "signup",
        end_cond=F.col("event_type") == "purchase",
        end_shift=F.lit(-2_000_000),
    ).select("event_id", "user_id")


@query(
    "q31_sessionize",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY epoch_us(ts),
                         event_id) IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY epoch_us(ts),
                         event_id) > 1800000000
                    THEN 1 ELSE 0 END AS b
        FROM events
    )
    SELECT user_id, event_id, ts_us,
           CAST(SUM(b) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
               AS session_id
    FROM g
    """,
)
def q31_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min gaps per user): lag →
    boundary → running sum, one shuffle. The batch twin of the
    streaming session_window path."""
    from ..operators.windows import sessionize

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts_us"
    )
    # event_id tiebreak keeps the order total (ts collisions exist)
    out = sessionize(
        e,
        ["user_id"],
        "ts_us",
        gap=1_800_000_000,
        order_by=["ts_us", "event_id"],
    )
    return out.select("user_id", "event_id", "ts_us", "session_id")

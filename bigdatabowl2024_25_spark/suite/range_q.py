"""Parity query: banded range join — purchases inside the hour after
each signup by the same user. Oracle is the plain inequality join
(DuckDB plans it as its own range join) — independent semantics check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.range_join import range_join
from ..sources.io import load_table
from .registry import query

_HOUR_US = 3_600_000_000


@query(
    "q36_range_join_signup_purchases",
    oracle=f"""
    WITH p AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
        FROM events WHERE event_type = 'purchase'
    ),
    s AS (
        SELECT user_id, event_id AS signup_event_id,
               epoch_us(ts) AS lo, epoch_us(ts) + {_HOUR_US} AS hi
        FROM events WHERE event_type = 'signup'
    )
    SELECT p.user_id, p.event_id, p.ts_us, p.value,
           s.signup_event_id, s.lo, s.hi
    FROM p JOIN s
      ON p.user_id = s.user_id AND p.ts_us >= s.lo AND p.ts_us <= s.hi
    """,
)
def q36_range_join_signup_purchases(spark, sf_dir):
    """Point-in-interval join via banding (equi-join on key+band, then
    exact containment) — one shuffle per side, each pair exactly once,
    never a nested-loop range join."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_us", "value"
    )
    s = e.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_event_id"),
        F.col("ts_us").alias("lo"),
        (F.col("ts_us") + _HOUR_US).alias("hi"),
    )
    return range_join(
        p, s, keys=["user_id"], point_col="ts_us",
        lo_col="lo", hi_col="hi", band_width=_HOUR_US,
    )

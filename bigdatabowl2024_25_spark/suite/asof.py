"""Parity query: as-of join over `events` — each click aligned with
the user's most recent view at-or-before it. The DuckDB oracle is the
engine-native ASOF JOIN, so the Spark union-then-window formulation is
checked against an independent implementation of the semantics, not a
re-derivation of itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.io import load_table
from .registry import query


@query(
    "q35_asof_click_view",
    oracle="""
    WITH clicks AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id, event_id AS view_event_id, value AS view_value,
               epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'view'
    )
    SELECT c.user_id, c.event_id, c.ts_us,
           v.view_event_id AS view_event_id_asof,
           v.view_value AS view_value_asof
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts_us >= v.ts_us
    """,
)
def q35_asof_click_view(spark, sf_dir):
    """As-of join (union-then-window, one shuffle, no range blowup)
    vs DuckDB's native ASOF JOIN."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts_us"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_event_id"),
        F.col("value").alias("view_value"),
        "ts_us",
    )
    return asof_join(
        clicks,
        views,
        keys=["user_id"],
        order_col="ts_us",
        payload=["view_event_id", "view_value"],
    )

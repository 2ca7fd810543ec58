"""Parity query: hypertable rollup cascade raw→1min→10min→1h. The
oracle aggregates raw→1h in one pass, so the two-step re-aggregation
algebra (sum of sums, sum of counts, min of mins, max of maxes) is
checked against an independent direct computation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.rollup import rollup_cascade
from ..sources.io import load_table
from .registry import query

_MIN_US = 60_000_000
_HOUR_US = 3_600_000_000


@query(
    "q37_hypertable_rollup",
    oracle=f"""
    SELECT event_type,
           CAST(FLOOR(epoch_us(ts) / {_HOUR_US}) AS BIGINT) * {_HOUR_US}
               AS bucket_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
           MIN(event_id) AS min_event,
           MAX(event_id) AS max_event
    FROM events
    GROUP BY 1, 2
    """,
)
def q37_hypertable_rollup(spark, sf_dir):
    """Continuous-aggregate cascade: the 1-h level is built from the
    10-min level, which is built from the 1-min level — raw data is
    scanned exactly once. Must equal the oracle's direct raw→1h
    aggregate (decomposable-agg algebra)."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "dvalue", F.col("value").cast("decimal(25,6)")
    )
    levels = rollup_cascade(
        e,
        keys=["event_type"],
        ts_col="ts_us",
        widths=[_MIN_US, 10 * _MIN_US, _HOUR_US],
        aggs={
            "n_events": ("count", "event_id"),
            "sum_value": ("sum", "dvalue"),
            "min_event": ("min", "event_id"),
            "max_event": ("max", "event_id"),
        },
    )
    hour = levels[_HOUR_US]
    return hour.select(
        "event_type",
        "bucket_start",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_event",
        "max_event",
    )

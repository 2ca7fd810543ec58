"""Parity queries: skew-handling (salting) over `events`.

The synthetic events table has uniform user_ids, so hot-key skew is
manufactured deterministically inside the query: every user_id < 100
collapses into key 0 (one key then holds ~two-thirds of all rows —
the 100 TB nightmare case where one reducer gets the world). Both
engines apply the same collapse; the oracle runs the PLAIN unsalted
formulation, so these queries prove the salted plans are
result-identical, not just plausible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.skew import salted_agg, salted_join
from ..sources.io import load_table
from .registry import query
from .stable import DEC

_HOT = "CASE WHEN user_id < 100 THEN 0 ELSE user_id END"


def _hot_events(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.withColumn(
        "hot_key",
        F.when(F.col("user_id") < 100, F.lit(0)).otherwise(F.col("user_id")),
    )


@query(
    "q33_salted_hot_agg",
    oracle=f"""
    SELECT {_HOT} AS hot_key,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
           COUNT(event_id) AS n_events,
           MIN(event_id) AS first_event,
           MAX(event_id) AS last_event
    FROM events GROUP BY 1
    """,
)
def q33_salted_hot_agg(spark, sf_dir):
    """Two-phase salted aggregation over a manufactured hot key
    (~2/3 of rows on one key). Phase 1 spreads the hot key over 16
    salt buckets with map-side combine; phase 2 merges 16 tiny
    partials. The oracle is the PLAIN group-by — bit-identical because
    sum(decimal)/count/min/max are associative."""
    e = _hot_events(spark, sf_dir).withColumn(
        "dvalue", F.col("value").cast(DEC)
    )
    out = salted_agg(
        e,
        keys=["hot_key"],
        aggs={
            "total_value": ("sum", "dvalue"),
            "n_events": ("count", "event_id"),
            "first_event": ("min", "event_id"),
            "last_event": ("max", "event_id"),
        },
        disambig=["event_id"],
        buckets=16,
    )
    return out.withColumn("total_value", F.col("total_value").cast("double"))


@query(
    "q34_salted_hot_join",
    oracle=f"""
    WITH hot AS (SELECT {_HOT} AS hot_key, event_id, value FROM events),
    dim AS (SELECT n_nationkey AS hot_key, n_name FROM nation)
    SELECT h.hot_key, d.n_name, h.event_id
    FROM hot h JOIN dim d ON d.hot_key = h.hot_key
    """,
)
def q34_salted_hot_join(spark, sf_dir):
    """Salted fact⋈dim join on the manufactured hot key: the fact side
    is salted on event_id, the 25-row dim replicated 8×, joined on
    (key, salt). Row-identical to the plain join (the oracle). In
    production this path is for dims too big to broadcast; the dim here
    is small only because the testdata is."""
    hot = _hot_events(spark, sf_dir).select("hot_key", "event_id", "value")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("hot_key"), "n_name"
    )
    out = salted_join(
        hot, n, keys=["hot_key"], disambig=["event_id"], buckets=8
    )
    return out.select("hot_key", "n_name", "event_id")

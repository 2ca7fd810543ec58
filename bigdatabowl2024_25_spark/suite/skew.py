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

_HOT = "CASE WHEN user_id < 100 THEN 0 ELSE user_id % 25 END"


def _hot_events(spark, sf_dir):
    # hot key 0 absorbs every user_id < 100 (~two-thirds of rows); the
    # rest fold onto the 25 nation keys so the join/agg output spans
    # all dim groups, not just the hot one
    e = load_table(spark, sf_dir, "events")
    return e.withColumn(
        "hot_key",
        F.when(F.col("user_id") < 100, F.lit(0)).otherwise(
            F.col("user_id") % 25
        ),
    )


@query(
    "q33_skew_salting",
    oracle=f"""
    WITH hot AS (SELECT {_HOT} AS hot_key, event_id, value FROM events),
    dim AS (SELECT n_nationkey AS hot_key, n_name FROM nation)
    SELECT h.hot_key, d.n_name,
           CAST(SUM(CAST(h.value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
           COUNT(h.event_id) AS n_events,
           MIN(h.event_id) AS first_event,
           MAX(h.event_id) AS last_event
    FROM hot h JOIN dim d ON d.hot_key = h.hot_key
    GROUP BY h.hot_key, d.n_name
    """,
)
def q33_skew_salting(spark, sf_dir):
    """Salted join feeding salted aggregation over a manufactured hot
    key (~2/3 of rows on one key) — round 3 merge of the two round-1
    skew queries (COVERAGE.md). The fact side is salted on event_id and
    the 25-row dim replicated 8×, joined on (key, salt) — the path for
    dims too big to broadcast; then the two-phase salted agg spreads
    the hot key over 16 salt buckets with map-side combine before
    merging 16 tiny partials. The oracle is the PLAIN join + group-by —
    bit-identical because sum(decimal)/count/min/max are associative."""
    hot = _hot_events(spark, sf_dir).select("hot_key", "event_id", "value")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("hot_key"), "n_name"
    )
    joined = salted_join(
        hot, n, keys=["hot_key"], disambig=["event_id"], buckets=8
    ).withColumn("dvalue", F.col("value").cast(DEC))
    out = salted_agg(
        joined,
        keys=["hot_key", "n_name"],
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

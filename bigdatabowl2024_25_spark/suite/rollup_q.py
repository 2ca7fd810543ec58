"""Parity query: hypertable rollup cascade raw→1min→10min→1h. The
oracle aggregates raw→1h in one pass, so the two-step re-aggregation
algebra (sum of sums, sum of counts, min of mins, max of maxes) is
checked against an independent direct computation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.rollup import gapfill, rollup_cascade, time_bucket
from ..sources.io import load_table
from .registry import query

_MIN_US = 60_000_000
_HOUR_US = 3_600_000_000


@query(
    "q37_hypertable_rollup",
    oracle=f"""
    WITH gf_obs AS (
        SELECT event_type,
               CAST(FLOOR(epoch_us(ts) / {_HOUR_US}) AS BIGINT)
                   * {_HOUR_US} AS b,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s
        FROM events WHERE value > 95 GROUP BY 1, 2
    ),
    gf_span AS (
        SELECT event_type, MIN(b) AS lo, MAX(b) AS hi
        FROM gf_obs GROUP BY 1
    ),
    gf_grid AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, {_HOUR_US})) AS b
        FROM gf_span
    ),
    gf_w AS (
        SELECT g.event_type, g.b, o.n, o.s,
               LAST_VALUE(o.s IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pv,
               FIRST_VALUE(o.s IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.b
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS nv,
               LAST_VALUE(CASE WHEN o.s IS NOT NULL THEN g.b END
                          IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pt,
               FIRST_VALUE(CASE WHEN o.s IS NOT NULL THEN g.b END
                           IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.b
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS nt
        FROM gf_grid g LEFT JOIN gf_obs o
          ON o.event_type = g.event_type AND o.b = g.b
    )
    SELECT 'rollup' AS kind, event_type,
           CAST(FLOOR(epoch_us(ts) / {_HOUR_US}) AS BIGINT) * {_HOUR_US}
               AS bucket_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
           MIN(event_id) AS min_event,
           MAX(event_id) AS max_event,
           CAST(NULL AS BOOLEAN) AS is_gap
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'gapfill', event_type, b,
           COALESCE(n, 0),
           CASE WHEN s IS NOT NULL THEN s
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv)
                     * (CAST(b - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
           END,
           NULL, NULL, s IS NULL
    FROM gf_w
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
    roll = hour.select(
        F.lit("rollup").alias("kind"),
        "event_type",
        "bucket_start",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "min_event",
        "max_event",
        F.lit(None).cast("boolean").alias("is_gap"),
    )

    # 'gapfill' (round 9): `rollup.gapfill` — densify the sparse
    # hourly series of high-value events so every hour between a
    # type's first and last observation has a row; counts zero-fill,
    # sums linearly interpolate; oracle mirrors with generate_series +
    # IGNORE NULLS windows.
    obs = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value") > 95)
        .groupBy(
            "event_type",
            time_bucket("ts_us", _HOUR_US).alias("bucket_start"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    gf = gapfill(
        obs,
        ["event_type"],
        "bucket_start",
        _HOUR_US,
        {"sum_value": "interp", "n_events": "zero"},
    ).select(
        F.lit("gapfill").alias("kind"),
        "event_type",
        "bucket_start",
        "n_events",
        "sum_value",
        F.lit(None).cast("bigint").alias("min_event"),
        F.lit(None).cast("bigint").alias("max_event"),
        "is_gap",
    )
    return roll.unionByName(gf)

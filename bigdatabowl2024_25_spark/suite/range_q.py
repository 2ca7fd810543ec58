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
    ),
    cv AS (
        SELECT user_id, lo AS t, 1 AS d FROM s
        UNION ALL
        SELECT user_id, hi, -1 FROM s
    ),
    cg AS (SELECT user_id, t, SUM(d) AS d FROM cv GROUP BY 1, 2),
    prof AS (
        SELECT user_id, t,
               CAST(SUM(d) OVER (PARTITION BY user_id ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS c
        FROM cg
    ),
    covp AS (
        SELECT user_id, t, c,
               LEAD(t) OVER (PARTITION BY user_id ORDER BY t) AS nt
        FROM prof
    ),
    cover AS (
        SELECT user_id,
               CAST(COALESCE(SUM(CASE WHEN c > 0 THEN nt - t END), 0)
                    AS BIGINT) AS covered,
               CAST(MAX(c) AS BIGINT) AS maxc
        FROM covp GROUP BY user_id
    )
    SELECT 'range' AS kind, p.user_id, p.event_id, p.ts_us, p.value,
           s.signup_event_id, s.lo, s.hi,
           CAST(NULL AS BIGINT) AS concurrency
    FROM p JOIN s
      ON p.user_id = s.user_id AND p.ts_us >= s.lo AND p.ts_us <= s.hi
    UNION ALL
    SELECT 'concur', user_id, NULL, t, NULL, NULL, NULL, NULL, c
    FROM prof
    UNION ALL
    SELECT 'cover', user_id, NULL, covered, NULL, NULL, NULL, NULL, maxc
    FROM cover
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
    nb = F.lit(None).cast("bigint")
    rj = range_join(
        p, s, keys=["user_id"], point_col="ts_us",
        lo_col="lo", hi_col="hi", band_width=_HOUR_US,
    ).select(
        F.lit("range").alias("kind"),
        "user_id",
        "event_id",
        "ts_us",
        "value",
        "signup_event_id",
        "lo",
        "hi",
        nb.alias("concurrency"),
    )
    # 'concur' (round 9): `range_join.concurrency_profile` — sweep-line
    # overlap counting of each user's signup sessions (end-exclusive:
    # back-to-back sessions never double-count); oracle mirrors with
    # a delta union + cumulative window.
    from ..operators.range_join import concurrency_profile

    prof = concurrency_profile(s, "lo", "hi", keys=["user_id"]).select(
        F.lit("concur").alias("kind"),
        "user_id",
        nb.alias("event_id"),
        F.col("ts").alias("ts_us"),
        F.lit(None).cast("double").alias("value"),
        nb.alias("signup_event_id"),
        nb.alias("lo"),
        nb.alias("hi"),
        "concurrency",
    )

    # 'cover' (round 10): `range_join.interval_coverage` — union
    # length of each user's (overlapping) signup sessions + peak
    # overlap, the no-double-count "total active time" aggregate; the
    # oracle re-derives it from the same boundary profile with a
    # lead() segment sum.
    from ..operators.range_join import interval_coverage

    cov = interval_coverage(s, "lo", "hi", keys=["user_id"]).select(
        F.lit("cover").alias("kind"),
        "user_id",
        nb.alias("event_id"),
        F.col("covered").alias("ts_us"),
        F.lit(None).cast("double").alias("value"),
        nb.alias("signup_event_id"),
        nb.alias("lo"),
        nb.alias("hi"),
        F.col("max_concurrency").alias("concurrency"),
    )
    return rj.unionByName(prof).unionByName(cov)

"""Behavioral analytics: ordered funnels and cohort retention.

The product-analytics pair every event-store engine ships (Druid,
ClickHouse `windowFunnel`/`retention`, Amplitude-class tools). The
reference's nearest analog is the read-order progression of
`BuildingReadOrder.R` (ordered first..fifth reads per play — the same
"earliest qualifying event after the previous step" recurrence
`windows.first_crossing` pins); these operators generalize it to
arbitrary step sequences and calendar cohorts over the events stream.

Scale notes:
- `funnel_steps` is a chain of len(steps) keyed aggregates + joins,
  ALL partitioned by the user column — one logical shuffle key the
  whole way, so Spark reuses the exchange across steps (AQE); each
  step's input is pre-filtered to that step's event type before it
  shuffles. No windows, no per-user state: min-aggregates with
  map-side partials absorb hot users.
- `cohort_retention` is two aggregates (first-activity bucket, then
  distinct (user, bucket) activity) joined on user and re-aggregated
  — the classic two-shuffle shape; counts are exact distinct users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within: int | None = None,
) -> DataFrame:
    """Per-user ordered funnel: step k's timestamp is the EARLIEST
    event of type ``steps[k]`` strictly after step k-1's timestamp
    (step 0 is the user's earliest ``steps[0]`` event). With
    ``within``, every step must land within ``within`` of step 0
    (same units as ``ts_col``) — the windowed funnel.

    Returns (user, t0..t{n-1}, reached): ``t{k}`` NULL once a step is
    missed (later steps are NULL by construction — they anchor on the
    previous step's time), ``reached`` = number of completed steps.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    e = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__ty"),
    )
    out = (
        e.filter(F.col("__ty") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("t0"))
    )
    for k, s in enumerate(steps[1:], 1):
        ek = e.filter(F.col("__ty") == s).select("__u", "__ts")
        cond = F.col("__ts") > F.col(f"t{k - 1}")
        if within is not None:
            cond = cond & (F.col("__ts") <= F.col("t0") + F.lit(within))
        tk = (
            ek.join(out.select("__u", "t0", f"t{k - 1}"), "__u")
            .filter(cond)
            .groupBy("__u")
            .agg(F.min("__ts").alias(f"t{k}"))
        )
        out = out.join(tk, "__u", "left")
    reached = sum(
        F.when(F.col(f"t{k}").isNotNull(), 1).otherwise(0)
        for k in range(len(steps))
    )
    return out.select(
        F.col("__u").alias(user_col),
        *[f"t{k}" for k in range(len(steps))],
        reached.cast("int").alias("reached"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_width: int,
) -> DataFrame:
    """Cohort retention triangle: users are cohorted by the bucket of
    their FIRST event (``floor(ts/width)``), and each (cohort, k) row
    counts the distinct users of that cohort active k buckets later
    (k=0 row == cohort size). Returns (cohort, k, n_users)."""
    e = events.select(
        F.col(user_col).alias("__u"),
        F.floor(F.col(ts_col) / F.lit(bucket_width))
        .cast("bigint")
        .alias("__b"),
    )
    first = e.groupBy("__u").agg(F.min("__b").alias("cohort"))
    active = e.distinct()
    return (
        active.join(first, "__u")
        .groupBy(
            "cohort", (F.col("__b") - F.col("cohort")).alias("k")
        )
        .agg(F.count_distinct("__u").alias("n_users"))
    )

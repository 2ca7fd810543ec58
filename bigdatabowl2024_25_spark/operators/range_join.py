"""Range (point-in-interval) join — banded, never a nested loop.

Spark executes `l.ts BETWEEN r.lo AND r.hi` joins as
BroadcastNestedLoopJoin / cartesian + filter: O(|l|·|r|) per key —
unusable at 100 TB. The banded formulation turns it into an equi-join:

- the point side gets band = floor(ts / W);
- the interval side explodes into the bands it overlaps
  (sequence(floor(lo/W), floor(hi/W)));
- equi-join on (keys, band), then the exact containment filter.

Each matching pair appears EXACTLY once — the only joining band is
floor(point/W), so no post-join dedup is needed. Cost: one shuffle per
side; interval replication = interval_width/W + 1 rows (pick W near
the typical interval width). This is the standard interval-join
strategy in Flink/AsterixDB-style engines, and the BDB analogue of
"frames within [line_set, ball_snap − 2 s]" (SURVEY §2.5 W12) when
the window bounds come from another table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    band_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join left rows (point_col) to right rows whose [lo_col, hi_col]
    interval contains the point, sharing `keys`. band_width is in
    point_col units (e.g. microseconds for epoch-us columns)."""
    w = F.lit(band_width).cast("long")
    band = lambda c: F.floor(F.col(c) / w).cast("long")  # noqa: E731
    lb = left.withColumn("__band", band(point_col))
    rb = right.withColumn(
        "__band", F.explode(F.sequence(band(lo_col), band(hi_col)))
    )
    return (
        lb.join(rb, [*keys, "__band"], how)
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__band")
    )


def concurrency_profile(
    df: DataFrame,
    lo_col: str,
    hi_col: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Sweep-line interval-overlap counting: how many intervals are
    live at each moment. Returns (keys…, ts, concurrency) where
    ``concurrency`` is the number of intervals covering
    ``[ts, next boundary)`` — end-exclusive, so back-to-back
    intervals never double-count at the seam. Max concurrency /
    capacity sizing is ``F.max(concurrency)`` over this.

    Shape: explode each interval into (+1 at lo, −1 at hi), aggregate
    deltas per boundary timestamp FIRST (map-side combine — the
    running sum then reads one row per DISTINCT boundary, not per
    interval), then one cumulative-sum window.

    Scale: with ``keys`` the window partitions per key — fully
    parallel. The global profile (keys=None) is an inherently ordered
    computation: Spark plans a single-partition window over the
    boundary table, which is fine exactly because the delta
    pre-aggregation has already collapsed the data to distinct
    boundaries (bucket timestamps upstream — e.g. `rollup.time_bucket`
    — to bound that cardinality at 100 TB; the alternative, a
    range-partitioned two-phase prefix sum, trades that bound for a
    sampled partitioner whose boundaries are not run-deterministic).

    NULL / inverted bounds (round-10 audit): a NULL boundary would
    sort FIRST under the cumulative window and shift every
    concurrency value after it — silent corruption. A NULL ``hi`` is
    therefore treated as an OPEN interval (live from ``lo`` onward —
    the still-active-session case: +1 at lo, no −1 anywhere); a NULL
    ``lo`` raises (an interval must start somewhere), as does
    ``hi < lo`` (a −1 before its +1 yields transient negative
    concurrency)."""
    ks = keys or []
    bad_lo = F.col(lo_col).isNull()
    bad_order = F.col(hi_col).isNotNull() & (
        F.col(hi_col) < F.col(lo_col)
    )
    df = df.filter(
        F.when(
            bad_lo,
            F.raise_error(
                F.lit(
                    "concurrency_profile: NULL lower bound — an "
                    "interval must start somewhere (NULL hi = open "
                    "interval is supported)"
                )
            ).cast("boolean"),
        )
        .when(
            bad_order,
            F.raise_error(
                F.concat(
                    F.lit("concurrency_profile: interval ends before "
                          "it starts ("),
                    F.col(hi_col).cast("string"),
                    F.lit(" < "),
                    F.col(lo_col).cast("string"),
                    F.lit(")"),
                )
            ).cast("boolean"),
        )
        .otherwise(F.lit(True))
    )
    lo = df.select(
        *ks, F.col(lo_col).alias("ts"), F.lit(1).alias("__d")
    )
    hi = df.filter(F.col(hi_col).isNotNull()).select(
        *ks, F.col(hi_col).alias("ts"), F.lit(-1).alias("__d")
    )
    deltas = (
        lo.unionByName(hi)
        .groupBy(*ks, "ts")
        .agg(F.sum("__d").alias("__d"))
    )
    w = (
        Window.partitionBy(*ks)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return deltas.select(
        *ks,
        "ts",
        F.sum("__d").over(w).cast("bigint").alias("concurrency"),
    )


def interval_coverage(
    df: DataFrame,
    lo_col: str,
    hi_col: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Union length of (possibly overlapping) intervals per key — the
    "total active time" aggregate every sessionized-usage pipeline
    bills from (overlapping sessions must not double-count). Returns
    (keys…, covered, max_concurrency): `covered` in the interval
    columns' units, `max_concurrency` the peak overlap for free (it
    rides the same profile).

    Built on `concurrency_profile`'s boundary table: a segment
    [boundary, next boundary) is covered iff its running count > 0,
    so covered = Σ (next − ts) over covered segments — one extra
    lead() on the per-key window the profile already sorted, then a
    per-key aggregate. Zero-length intervals contribute zero (their
    +1/−1 collapse at the same boundary).

    Unlike the profile, an OPEN interval (NULL hi) is an ERROR here:
    its coverage is unbounded, and silently treating it as closed
    would under-bill exactly the still-running sessions. Close open
    intervals at an observation horizon first (coalesce(hi, now))."""
    ks = keys or []
    df = df.filter(
        F.when(
            F.col(hi_col).isNull(),
            F.raise_error(
                F.lit(
                    "interval_coverage: NULL upper bound — an open "
                    "interval has unbounded coverage; close it at an "
                    "observation horizon first (coalesce(hi, now))"
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    )
    prof = concurrency_profile(df, lo_col, hi_col, keys=ks)
    w = Window.partitionBy(*ks).orderBy("ts")
    seg = prof.withColumn("__next", F.lead("ts").over(w))
    agg = [
        F.coalesce(
            F.sum(
                F.when(
                    F.col("concurrency") > 0,
                    F.col("__next") - F.col("ts"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("covered"),
        F.max("concurrency").cast("bigint").alias("max_concurrency"),
    ]
    return seg.groupBy(*ks).agg(*agg) if ks else seg.agg(*agg)

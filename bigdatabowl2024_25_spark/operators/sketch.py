"""Frequency sketches: Count-Min over a grouped stream, plus the
point-query lookup. Deterministic (portable-hash rows) so the DuckDB
oracle reproduces the sketch counters bit-for-bit.

Why a sketch at 100 TB: exact per-key counts of a high-cardinality
column (URLs, doc fingerprints) need a shuffle keyed by that column —
the sketch needs a shuffle keyed by (depth × width) COUNTERS, a fixed
few KB regardless of input size, and merges by addition across
partitions/days (the same decomposable-agg algebra as
`skew.salted_agg` / `rollup.rollup_cascade`).

Estimate guarantee: est ≥ true; est ≤ true + ε·N with prob 1−δ for
width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import portable_hash64


def _bucket(col: Column, row: int, width: int) -> Column:
    """Row-r bucket index of a value: portable hash seeded by r."""
    return F.pmod(portable_hash64(col.cast("string"), seed=row), F.lit(width))


def cms_build(
    df: DataFrame, value_col: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Count-Min sketch of a column: (row, bucket, cnt) counters —
    depth×width rows total, built with ONE aggregate over an exploded
    (row, bucket) pair per input value. Merge sketches from different
    partitions/sources by summing cnt on (row, bucket)."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _bucket(F.col(value_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_query(
    sketch: DataFrame, items: DataFrame, item_col: str, width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point query: est(item) = min over rows of the item's counter.
    The sketch is tiny → broadcast; items never shuffle."""
    probes = items.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(item_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(item_col, F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def hll_within_contract(
    df: DataFrame, col: str, rel_err: float = 0.05
) -> DataFrame:
    """One row: exact distinct count + whether HyperLogLog++
    (`approx_count_distinct` at `rel_err` target standard deviation)
    landed within 4σ of it. The HLL register values are
    implementation-specific (not oracle-reproducible), but the ERROR
    CONTRACT is checkable exactly: the oracle asserts `within = TRUE`,
    so a broken sketch shows as a value mismatch. At scale HLL is the
    constant-memory replacement for COUNT(DISTINCT)'s shuffle of every
    key; this operator documents (and pins) the accuracy trade."""
    bound = 4.0 * rel_err
    return df.agg(
        F.countDistinct(col).alias("exact_n"),
        F.approx_count_distinct(col, rel_err).alias("__est"),
    ).select(
        "exact_n",
        (
            F.abs(F.col("__est") - F.col("exact_n"))
            <= F.col("exact_n") * bound
        ).alias("within"),
    )


def quantile_within_contract(
    df: DataFrame, col: str, q: float = 0.5, accuracy: int = 1000
) -> DataFrame:
    """One row: row count + whether `percentile_approx`'s q-quantile
    honors its documented RANK guarantee: the returned value's rank is
    within n/accuracy of q·n. The KLL/GK summary itself is engine-
    internal, but rank error is exactly checkable from the data —
    the oracle asserts `within = TRUE`."""
    est = df.agg(
        F.percentile_approx(col, q, accuracy).alias("est")
    ).collect()[0].est
    n = F.count(F.lit(1)).cast("double")
    # with duplicated values the estimate's rank is an INTERVAL
    # [count(<est)+1, count(<=est)]; the guarantee holds iff that
    # interval overlaps [q·n − n/acc, q·n + n/acc]
    rank_hi = F.sum((F.col(col) <= F.lit(est)).cast("long")).cast("double")
    rank_lo = (
        F.sum((F.col(col) < F.lit(est)).cast("long")).cast("double") + 1
    )
    tol = n / accuracy + 1
    return df.agg(
        F.count(F.lit(1)).alias("exact_n"),
        (
            (rank_lo <= n * q + tol) & (rank_hi >= n * q - tol)
        ).alias("within"),
    )

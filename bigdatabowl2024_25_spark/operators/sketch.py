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

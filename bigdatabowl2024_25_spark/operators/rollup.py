"""Hypertable-style multi-resolution time rollups (continuous
aggregates).

The TimescaleDB/Druid pattern: aggregate raw events once at the
finest resolution, then build every coarser resolution FROM the next
finer aggregate — never re-scanning raw data. At 100 TB the raw scan
happens once; the 10-min level reads the 1-min level (~1/600 the
rows), the 1-h level reads the 10-min level, and so on. Correct for
decomposable aggregates only (sum/count/min/max — the same algebra as
`operators.skew.salted_agg`); avg must travel as sum+count and divide
at read time.

The q37 oracle aggregates raw→1h directly, so the cascade's
re-aggregation algebra is verified, not assumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def time_bucket(ts_col: Column | str, width: int) -> Column:
    """Bucket start (same units as the column, e.g. epoch-us):
    floor(ts/width)·width."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (F.floor(c / F.lit(width)) * F.lit(width)).cast("long")


def rollup_cascade(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    widths: list[int],
    aggs: dict[str, tuple[str, str | Column]],
    bucket_col: str = "bucket_start",
) -> dict[int, DataFrame]:
    """Build one aggregate per width; widths must be ascending and
    each divisible by its predecessor. Level 0 reads `df`; level i>0
    reads level i−1. Returns {width: DataFrame(keys, bucket_col,
    *aggs)}."""
    for a, b in zip(widths, widths[1:]):
        if b % a:
            raise ValueError(f"width {b} not a multiple of {a}")
    out: dict[int, DataFrame] = {}
    phase1 = [
        _DECOMPOSABLE[op][0](col).alias(name)
        for name, (op, col) in aggs.items()
    ]
    phase2 = [
        _DECOMPOSABLE[op][1](name).alias(name)
        for name, (op, _col) in aggs.items()
    ]
    level = df.groupBy(
        *keys, time_bucket(ts_col, widths[0]).alias(bucket_col)
    ).agg(*phase1)
    out[widths[0]] = level
    for w in widths[1:]:
        level = level.groupBy(
            *keys, time_bucket(bucket_col, w).alias(bucket_col)
        ).agg(*phase2)
        out[w] = level
    return out

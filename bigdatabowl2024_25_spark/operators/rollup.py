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


def gapfill(
    buckets: DataFrame,
    keys: list[str],
    bucket_col: str,
    width: int,
    fills: dict[str, str],
) -> DataFrame:
    """`time_bucket_gapfill`: densify a bucketed series so every key
    has a row for EVERY bucket between its first and last observation,
    with per-column fill policy:

    - ``"zero"``  → missing buckets get 0 (counts);
    - ``"locf"``  → last observation carried forward (gauges);
    - ``"interp"``→ linear interpolation between the neighboring
      observations (leading/trailing edges carry the nearest value,
      since one side has no anchor).

    Returns keys + bucket_col + the filled columns + ``is_gap``.

    Scale: the dense grid is SYNTHESIZED, not scanned — one tiny
    per-key (min, max) aggregate explodes into `sequence()` rows, so
    no IO amplification; the grid joins the data on (keys, bucket)
    — one keyed shuffle each side — and every fill is a window over
    the (keys) partition ordered by bucket, sharing ONE sort. LOCF
    and interpolation read only observed values (`ignoreNulls`), so
    the result is independent of how many gap rows the grid added.
    Interpolation arithmetic is a single IEEE expression mirrored by
    the q37 oracle; everything else is exact.

    ``is_gap`` means ROW ABSENT, not value-NULL: presence is marked
    with a literal on the observed side before the left join, so an
    observed bucket whose metric is legitimately NULL reports
    ``is_gap = false`` and is NOT zero-filled (round-10 ADVICE fix —
    inferring gaps from the first fill column's NULL-ness conflated
    the two). LOCF/interp still treat an observed NULL as a missing
    observation and bridge across it (TimescaleDB ``locf`` /
    ``interpolate`` semantics).
    """
    for c, how in fills.items():
        if how not in ("zero", "locf", "interp"):
            raise ValueError(f"unknown fill {how!r} for column {c!r}")
    from pyspark.sql import Window

    span = buckets.groupBy(*keys).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(width))
        ).alias(bucket_col),
    )
    if "__present" in buckets.columns:
        raise ValueError(
            "gapfill: buckets already carries reserved column "
            "'__present'; drop or rename it first"
        )
    d = grid.join(
        buckets.withColumn("__present", F.lit(1)),
        [*keys, bucket_col],
        "left",
    ).withColumn("is_gap", F.col("__present").isNull())
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    fwd = w.rowsBetween(0, Window.unboundedFollowing)
    out_cols = []
    for c, how in fills.items():
        col = F.col(c)
        if how == "zero":
            # zero-fill only synthesized gap rows; an observed row's
            # NULL metric stays NULL (presence ≠ value).
            filled = F.when(
                F.col("is_gap"), F.lit(0).cast(buckets.schema[c].dataType)
            ).otherwise(col)
        elif how == "locf":
            filled = F.last(col, ignorenulls=True).over(back)
        else:  # interp
            pv = F.last(col, ignorenulls=True).over(back)
            nv = F.first(col, ignorenulls=True).over(fwd)
            pt = F.last(
                F.when(col.isNotNull(), F.col(bucket_col)), ignorenulls=True
            ).over(back)
            nt = F.first(
                F.when(col.isNotNull(), F.col(bucket_col)), ignorenulls=True
            ).over(fwd)
            frac = (F.col(bucket_col) - pt).cast("double") / (
                nt - pt
            ).cast("double")
            filled = (
                F.when(col.isNotNull(), col)
                .when(pv.isNull(), nv)
                .when(nv.isNull(), pv)
                .otherwise(pv + (nv - pv) * frac)
            )
        out_cols.append(filled.alias(c))
    return d.select(*keys, bucket_col, *out_cols, "is_gap")


def rollup_delta_merge(
    existing: DataFrame,
    new_events: DataFrame,
    keys: list[str],
    ts_col: str,
    width: int,
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Incremental continuous-aggregate maintenance: fold a new batch
    of raw events into an EXISTING rollup table without rescanning
    history — aggregate the batch at bucket granularity, then merge
    bucket-by-bucket with the decomposable re-aggregation algebra
    (sum+sum, count+sum, min+min, max+max — the same `_DECOMPOSABLE`
    table the cascade uses).

    Scale: cost ∝ batch, never history. The batch collapses to its
    touched (keys, bucket) rows map-side; the merge is one full-outer
    join on (keys, bucket) — bucket both tables and neither moves.
    This is the materialized-view maintenance loop: daily batch →
    `rollup_delta_merge` → overwrite touched partitions. Late data
    lands in whatever (old) bucket it belongs to — the merge is
    bucket-keyed, so backfill needs no special path.
    """
    for name, (kind, _col) in aggs.items():
        if kind not in _DECOMPOSABLE:
            raise ValueError(f"{kind!r} is not decomposable ({name})")
    bucket = time_bucket(ts_col, width).alias("bucket_start")
    first = [
        _DECOMPOSABLE[kind][0](col).alias(name)
        for name, (kind, col) in aggs.items()
    ]
    delta = new_events.groupBy(*keys, bucket).agg(*first)

    e, d = existing.alias("e"), delta.alias("d")
    on = [*keys, "bucket_start"]
    cond = None
    for k in on:
        c = F.col(f"e.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else (cond & c)
    j = e.join(d, cond, "full_outer")
    merge_fn = {
        "sum": lambda a, b: a + b,
        "count": lambda a, b: a + b,
        "min": F.least,
        "max": F.greatest,
    }
    out = [
        F.coalesce(F.col(f"e.{k}"), F.col(f"d.{k}")).alias(k) for k in on
    ]
    for name, (kind, _col) in aggs.items():
        a, b = F.col(f"e.{name}"), F.col(f"d.{name}")
        merged = (
            F.when(a.isNull(), b)
            .when(b.isNull(), a)
            .otherwise(merge_fn[kind](a, b))
        )
        out.append(merged.alias(name))
    return j.select(*out)

"""Aggregation operators (SURVEY.md §2.4, A1-A12).

All are expressible with built-in JVM-side aggregate functions — no
UDAFs. The one real correctness risk, ordered string aggregation (A7),
sorts *inside* the aggregate so results are invariant under
repartitioning (bare collect_list order is nondeterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_median(
    df: DataFrame, keys: list[str], value: str, out: str
) -> DataFrame:
    """A2: `summarize(throw_speed = median(s, na.rm=TRUE))`
    (`Openness_Data_Frame_Prep.R:87-88`). Exact median (Spark ≥3.4)
    for oracle parity; swap to percentile_approx at 100 TB when the
    consumer tolerates approximation."""
    return df.groupBy(*keys).agg(F.median(value).alias(out))


def multi_stat(
    df: DataFrame, keys: list[str], value: str, prefix: str | None = None
) -> DataFrame:
    """A5: pandas `.agg({"x":["mean","std"], ...})`
    (`DefCoverage.ipynb` cell 2; `DefPosModel.ipynb` cell 1). pandas
    std is the sample stddev → stddev_samp."""
    p = prefix or value
    return df.groupBy(*keys).agg(
        F.avg(value).alias(f"{p}_mean"),
        F.stddev_samp(value).alias(f"{p}_std"),
        F.min(value).alias(f"{p}_min"),
        F.max(value).alias(f"{p}_max"),
        F.count(value).alias(f"{p}_count"),
    )


def first_last_by(
    df: DataFrame, keys: list[str], order_col: str, value: str
) -> DataFrame:
    """A6: `.agg(start_x=('x','first'), end_x=('x','last'))` after a
    frame sort (`DefPosModel.ipynb` cell 1, defender_start_end).
    min_by/max_by avoid the window + filter round-trip: single hash
    aggregate, map-side partial."""
    return df.groupBy(*keys).agg(
        F.min_by(value, order_col).alias(f"start_{value}"),
        F.max_by(value, order_col).alias(f"end_{value}"),
    )


def ordered_string_agg(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value: str,
    out: str,
    sep: str = " ",
) -> DataFrame:
    """A7: `summarise(route_tree = paste(routeRan, collapse=" "))` with
    an explicit `arrange(gameId, playId, y)` beforehand (`Matchup
    Information.R:38-41,63-68`). Spark sort order does not survive into
    collect_list, so the sort happens inside the aggregate:
    collect structs of (order, value), array_sort, project, join.
    `order_col` must be unique per group for determinism."""
    return df.groupBy(*keys).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(order_col), F.col(value)))),
                lambda s: s[value].cast("string"),
            ),
            sep,
        ).alias(out)
    )


def pivot_wide(
    df: DataFrame,
    ids: list[str],
    pivot_col: str,
    pivot_values: list,
    aggs: list[Column],
    fill: float | None = 0.0,
) -> DataFrame:
    """A8: `pivot_wider(names_from=defLabel, values_from=(x,y,s))` →
    33 wide defender columns (`Openness_Data_Frame_Prep.R:38-43`);
    pandas `pivot_table(fill_value=0)` (`DefCoverage.ipynb` cell 3).
    Explicit `pivot_values` skips Spark's extra distinct-values job —
    at 100 TB that job is a full extra scan."""
    out = df.groupBy(*ids).pivot(pivot_col, pivot_values).agg(*aggs)
    return out.na.fill(fill) if fill is not None else out


def entropy(
    df: DataFrame, keys: list[str], label: str, out: str
) -> DataFrame:
    """A11: normalized-count Shannon entropy, log2
    (`QBReadStats.R:330-341`). Two hash aggregates, no window: count
    per (keys,label), then -Σ p·log2(p) per keys."""
    counts = df.groupBy(*keys + [label]).agg(F.count("*").alias("__n"))
    tot = Window.partitionBy(*keys)
    p = (F.col("__n") / F.sum("__n").over(tot))
    return (
        counts.withColumn("__p", p)
        .groupBy(*keys)
        .agg((-F.sum(F.col("__p") * F.log2("__p"))).alias(out))
    )


def conditional_count(cond: Column, alias: str) -> Column:
    """A12: `sum(dig)` / `sum(is_exp_max)` (`cover_threshold.R:37`,
    `QBReadStats.R:216-218`)."""
    return F.sum(F.when(cond, 1).otherwise(0)).alias(alias)


def row_sum(cols: list[str], alias: str) -> Column:
    """A10: horizontal `rowSums(data[, 5:22])` (`cover_threshold.R:11`)."""
    out = F.lit(0.0)
    for c in cols:
        out = out + F.coalesce(F.col(c), F.lit(0.0))
    return out.alias(alias)


def mad_outliers(
    df: DataFrame,
    keys: list[str],
    value: str,
    c_num: int = 3,
    c_den: int = 1,
    out: str = "is_mad_outlier",
) -> DataFrame:
    """Robust per-group outlier rule: flag rows with
    |x − median| · c_den > c_num · MAD, MAD = median(|x − median|) —
    the median-absolute-deviation test every data-quality pass
    reaches for when `rolling_anomaly`'s mean/stddev would be skewed
    by the very outliers it hunts (a single 1e9 row moves a mean
    arbitrarily; it moves a median one rank). Appends `out` (boolean;
    NULL value → NULL flag) plus the group's `__med`/`__mad` columns
    for the caller to inspect or drop.

    Determinism: both medians are the exact interpolating median
    (`group_median` A2 discipline — Spark and DuckDB agree, q40-
    proven); the comparison is IEEE subtract/multiply of identical
    doubles, so flag membership is engine-exact with no quantization
    step needed.

    Scale: two grouped-median shuffles on `keys` + one keyed join of
    the group stats back onto the facts (group table is |groups|-
    sized — broadcastable for dimension-like keys; AQE converts).
    Exact medians need a full sort per group; at 100 TB swap
    `F.median` for percentile_approx and keep the rule, like A2."""
    med = df.groupBy(*keys).agg(F.median(value).alias("__med"))
    # null-safe key equality: groupBy keeps NULL as a group, so the
    # stats joins must match it back too — a plain equi-join would
    # silently DROP every NULL-keyed input row from the output (the
    # round-10 ADVICE defect class: rows vanishing, not rows wrong)
    def _nsj(left: DataFrame, right: DataFrame) -> DataFrame:
        cond = None
        for k in keys:
            c = left[k].eqNullSafe(right[k])
            cond = c if cond is None else (cond & c)
        return left.join(right, cond).drop(*[right[k] for k in keys])

    j = _nsj(df, med)
    mad = j.groupBy(*keys).agg(
        F.median(F.abs(F.col(value) - F.col("__med"))).alias("__mad")
    )
    return (
        _nsj(j, mad)
        .withColumn(
            out,
            F.abs(F.col(value) - F.col("__med")) * F.lit(c_den)
            > F.lit(c_num) * F.col("__mad"),
        )
    )


def group_trend(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-key least-squares trend slope — the metrics-pipeline
    staple ("is this user's value drifting?"), computed EXACTLY from
    integer moment sums so it is bit-identical on any engine and
    partitioning (a float Σxy drifts with add order):

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    with y = floor(value·scale) micro-units and x = seconds since the
    KEY's first observation (re-centering keeps x² within decimal
    range: raw epoch-micros squared would overflow 38 digits).
    Returns (keys…, n, slope_micro): micro-value-units per second,
    truncated toward zero — Spark `div` and DuckDB `//` agree.
    NULL values AND NULL timestamps are excluded from the fit (a
    NULL-ts row must not inflate n while its x skips the moment sums
    — n would silently disagree with Σx and corrupt the slope); a key
    with < 2 distinct timestamps (zero x-variance) yields NULL slope.
    Dropping x is sound because the slope is exactly shift-invariant
    in x (n·Σ(x+c)y − Σ(x+c)·Σy ≡ n·Σxy − Σx·Σy in integer
    arithmetic), so re-centering against a min taken before or after
    the filter gives the identical result.

    Cost: ONE groupBy shuffle — the re-centering min rides a window
    over the same partitioning, and all five moment sums fold
    map-side. All decimal(38,0)."""
    w = Window.partitionBy(*keys)
    tu = (F.col(ts_col) / F.lit(1_000_000)).cast("long")
    x = (tu - F.min(tu).over(w)).cast("decimal(38,0)")
    y = F.floor(F.col(value_col) * F.lit(float(scale))).cast(
        "decimal(38,0)"
    )
    staged = df.select(*keys, x.alias("__x"), y.alias("__y")).filter(
        F.col("__y").isNotNull() & F.col("__x").isNotNull()
    )
    agg = staged.groupBy(*keys).agg(
        F.count("*").cast("decimal(38,0)").alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
    )
    den = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    return agg.select(
        *keys,
        F.col("__n").cast("bigint").alias("n"),
        F.when(
            den > 0,
            F.expr(
                "(__n * __sxy - __sx * __sy) div "
                "(__n * __sxx - __sx * __sx)"
            ),
        ).alias("slope_micro"),
    )

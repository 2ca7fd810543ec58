"""Z-order (Morton-curve) clustered writes — the multi-dimensional
data-skipping layout for 100 TB fact tables.

A single-column sort gives parquet min/max pruning on that column
only; interleaving the bits of SEVERAL columns into one Morton key and
range-partition-sorting on it gives every interleaved column locality
at once: a range predicate on ANY of them overlaps only the files
whose min/max stripe intersects it (the Delta/Iceberg `OPTIMIZE
ZORDER BY` layout, from Morton 1966).

Spark-first shape: per-column min/max is ONE single-row aggregate
broadcast back; quantization and bit-interleave are pure codegen
shift/or arithmetic (no UDFs); the layout itself is
`repartitionByRange` + `sortWithinPartitions` on the key — exactly one
range-exchange, the same cost as any global sort, paid once at write
time and amortized over every subsequent pruned scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits kept per dimension. 2 dims × 16 bits = 32-bit keys; up to 4
#: dims stay inside int64. More bits than file count × rows-per-file
#: resolution is wasted: 16 bits ≈ 65k distinct stripes per dimension.
DEFAULT_BITS = 16


def interleave_bits(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton key from already-quantized non-negative ints in
    [0, 2^bits): bit i of column j lands at position i*len(cols)+j.
    Pure shift/and/or codegen — one expression, no shuffle."""
    if not 1 <= len(cols) * bits <= 63:
        raise ValueError("interleave_bits: len(cols)*bits must be ≤ 63")
    terms = [
        F.shiftleft(
            F.shiftright(c.cast("bigint"), i).bitwiseAND(F.lit(1)),
            i * len(cols) + j,
        )
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    out_col: str = "__z",
) -> DataFrame:
    """Append the Morton key over `cols` (numeric). Each column is
    min/max-quantized to [0, 2^bits−1] using ONE broadcast stats row —
    rank-free, so no extra shuffle before the write's range exchange.
    (Min/max quantization is skew-sensitive where rank isn't; for
    heavy-tailed columns pre-transform, e.g. log, before calling.)
    Nulls and NaNs quantize to 0 (sort first, prune like the minimum —
    NaNs must be scrubbed BEFORE the stats agg: Spark's max() sorts
    NaN above every number, so one corrupt row would otherwise poison
    the span and silently zero the whole dimension's clustering)."""
    def clean(c: str) -> Column:
        d = F.col(c).cast("double")
        return F.when(F.isnan(d), F.lit(None)).otherwise(d)

    stats = df.agg(
        *[F.min(clean(c)).alias(f"__mn_{i}") for i, c in enumerate(cols)],
        *[F.max(clean(c)).alias(f"__mx_{i}") for i, c in enumerate(cols)],
    )
    j = df.crossJoin(F.broadcast(stats))
    top = float(2**bits - 1)
    quant = []
    for i, c in enumerate(cols):
        mn, mx = F.col(f"__mn_{i}"), F.col(f"__mx_{i}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        q = F.floor(
            (F.coalesce(clean(c), mn) - mn) / span * top
        ).cast("bigint")
        # coalesce BEFORE least: an all-NULL column gives mn NULL ⇒ q
        # NULL, and least() ignores NULL args (would return top, not
        # NULL) — so pin the nulls→0 contract first, then least()
        # guards the max row landing on 2^bits (floor of exactly top)
        quant.append(F.least(F.coalesce(q, F.lit(0)), F.lit(int(top))))
    z = interleave_bits(quant, bits)
    drop = [f"__mn_{i}" for i in range(len(cols))] + [
        f"__mx_{i}" for i in range(len(cols))
    ]
    return j.withColumn(out_col, z).drop(*drop)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = DEFAULT_BITS,
    mode: str = "overwrite",
) -> None:
    """Write `df` as `n_files` parquet files clustered on the Morton
    curve over `cols`: range-partition by the key (contiguous curve
    segments per file), sort within each file (row-group pruning
    inside files too), drop the key before writing. Every column in
    `cols` then prunes at BOTH file and row-group granularity via
    plain parquet min/max stats — no table format required."""
    zdf = with_zvalue(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )

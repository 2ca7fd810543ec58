"""Determinism helpers for float aggregation parity.

Summing doubles is order-dependent; Spark's partition-parallel reduce
and DuckDB's sequential scan would diverge in low bits and break the
driver's value-hash compare. Casting each addend to a fixed-scale
decimal makes the reduction exact (integer arithmetic underneath) and
therefore order-independent and engine-independent; the final cast back
to double is a single deterministic conversion.

The same pattern in the oracle SQL: ``CAST(SUM(CAST(x AS
DECIMAL(25,6))) AS DOUBLE)``. Per-row double math (e.g.
``l_extendedprice*(1-l_discount)``) stays in double — it has no
ordering freedom, so it is bit-identical across engines.

Scale note: decimal sums are marginally slower than double sums but
stay inside whole-stage codegen and partial (map-side) aggregation; at
100 TB this costs a few percent, not a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"
#: higher-scale variant for unit-magnitude addends (probabilities,
#: p*log2(p) terms) where 6 fractional digits would truncate visibly
DEC12 = "decimal(25,12)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a double column."""
    return F.sum(_c(col).cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, in double."""
    c = _c(col)
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def dstddev_samp(col: Column | str, alias: str) -> Column:
    """Order-independent sample stddev via exact moment sums:
    sqrt((n*Σx² − (Σx)²) / (n*(n−1))).

    pandas `.std()` in the reference (`DefCoverage.ipynb` cell 2) is the
    sample stddev, so this is the parity target for A5. The final
    round-6 absorbs engine-level expression-fusion differences
    (DuckDB's C++ may contract ``n*Σx² − (Σx)²`` into an FMA; the JVM
    never does — observed ~1e-11 relative drift without it).
    """
    c = _c(col)
    n = F.count(c).cast("double")
    sx = F.sum(c.cast(DEC)).cast("double")
    sx2 = F.sum((c * c).cast(DEC)).cast("double")
    return F.round(
        F.sqrt((n * sx2 - sx * sx) / (n * (n - F.lit(1.0)))), 6
    ).alias(alias)


def epoch_us(col_name: str) -> Column:
    """Timezone-independent epoch micros for a TIMESTAMP_NTZ column —
    pure wall-clock arithmetic, equal to DuckDB `epoch_us(col)`.
    (unix_micros only accepts LTZ and would drag the session timezone
    in; the driver's session timezone is not ours to control.)"""
    return F.expr(
        f"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', {col_name})"
    )


def oracle_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) AS {alias}"


def oracle_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def oracle_dstddev_samp(expr: str, alias: str) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    sx = f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"
    sx2 = f"CAST(SUM(CAST(({expr})*({expr}) AS DECIMAL(25,6))) AS DOUBLE)"
    return (
        f"ROUND(SQRT(({n}*{sx2} - {sx}*{sx}) / ({n}*({n}-1.0))), 6) AS {alias}"
    )

"""Skew-handling operators: salting for hot keys.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
`session.get_spark`) handles moderate skew transparently; these
operators are the explicit scale path for the pathological case — a
handful of keys holding a double-digit percentage of a 100 TB fact
table, where a single reducer would spill or die:

- `salted_agg`: two-phase aggregation. Phase 1 groups by
  (key, salt) — the hot key's rows spread over `buckets` reducers and
  combine map-side; phase 2 merges the tiny per-salt partials by key.
  Only decomposable aggregates are offered (sum/count/min/max — avg is
  sum+count at the call site); a non-decomposable aggregate (median,
  collect_list-ordered) cannot be salted and must use AQE or a
  two-level key redesign.
- `salted_join`: fact⋈dim where the dim is too big to broadcast and
  the fact's join key is hot. The fact side gets a deterministic salt;
  the dim side is replicated `buckets`× via explode(sequence(...)), so
  (key, salt) partitions the hot key across reducers. Replication
  costs buckets×|dim| rows — use only when broadcast is impossible and
  AQE splitting is insufficient.

The salt is `pmod(xxhash64(disambiguator cols), buckets)` — it only
steers row placement, never appears in results, so engine-specific
xxhash64 is fine here (unlike the portable content hashes in
`operators.text`). Results are bit-identical to the unsalted
formulation, which is exactly what the q33/q34 DuckDB oracles check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

#: decomposable aggregate specs: op -> (phase1 fn, phase2 fn)
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def with_salt(df: DataFrame, disambig: list[str], buckets: int) -> DataFrame:
    """Deterministic salt column from high-cardinality disambiguator
    columns (e.g. the fact table's own row keys)."""
    return df.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in disambig]), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    disambig: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    `aggs` maps output name -> (op, input column) with op in
    sum/count/min/max. Example:
        salted_agg(events, ["k"], {"total": ("sum", "value"),
                                   "n": ("count", "value")}, ...)
    is bit-identical to groupBy("k").agg(sum, count) — including for
    decimal-cast inputs, since decimal sums are associative. Derived
    grouping keys: withColumn them before calling (keys are names).
    """
    phase1 = [
        _DECOMPOSABLE[op][0](col).alias(f"__p_{out}")
        for out, (op, col) in aggs.items()
    ]
    phase2 = [
        _DECOMPOSABLE[op][1](f"__p_{out}").alias(out)
        for out, (op, _col) in aggs.items()
    ]
    salted = with_salt(df, disambig, buckets)
    partial = salted.groupBy(*keys, _SALT).agg(*phase1)
    return partial.groupBy(*keys).agg(*phase2)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    disambig: list[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof fact⋈dim equi-join: salt the fact, replicate the dim
    per salt value, join on keys + salt. Row-identical to
    fact.join(dim, keys, how)."""
    f = with_salt(fact, disambig, buckets)
    d = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("long"))
    return f.join(d, [*keys, _SALT], how).drop(_SALT)

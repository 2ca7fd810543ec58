"""Edit-distance similarity join (fuzzy matching / record linkage).

The entity-resolution primitive: find pairs of strings within
Levenshtein distance k without an all-pairs scan, via q-gram count
blocking (Gravano et al., "Approximate String Joins in a Database
(Almost) for Free", VLDB 2001):

- one edit operation rewrites at most ``q`` gram positions, so it can
  remove at most ``q`` DISTINCT gram types; two strings within
  distance k therefore share at least ``max(d(a), d(b)) − k·q``
  distinct grams (d = distinct-gram count) — a COUNT filter over an
  inverted (id, gram) index with no false negatives while the bound
  is positive;
- the same argument gives ``d(b) ≤ d(a) + k·q``, so strings whose
  bound is vacuous (d ≤ k·q) can only match strings with
  d ≤ 2·k·q — they fall back to a small bounded block instead of
  silently losing recall;
- ``|len(a) − len(b)| ≤ k`` always holds at distance k and prunes
  candidates for free;
- survivors verify with the exact built-in ``levenshtein`` (identical
  unit-cost definition in Spark and DuckDB, which is what lets the
  q50 oracle check the WHOLE funnel against a brute-force cross
  join — a blocking bug shows up as a missing pair, not a silent
  recall loss).

Scale: the corpus never cross-joins. The inverted index shuffles
(id, 8-byte gram-hash) rows; candidate volume is bounded by gram
selectivity (worst case — near-identical key spaces like sequential
IDs — degrades toward the true pair count, which no blocking can
beat); the verify is one codegen levenshtein per candidate; the
count filter is a groupBy on the pair key with map-side combine.
Same funnel discipline as MinHash-LSH (`dedup.py`) and dHash banding
(`phash.py`), with a count threshold instead of a band-collision
rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import portable_hash64


def _gram_hashes(col, q: int):
    """Distinct q-gram hashes of a string (8-byte keys — the gram
    text itself never shuffles)."""
    n = F.length(col)
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(q - 1), F.lit(0))
    )
    return F.array_distinct(
        F.transform(
            starts, lambda i: portable_hash64(F.substring(col, i, q))
        )
    )


def edit_distance_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    k: int = 2,
    q: int = 2,
) -> DataFrame:
    """All pairs (id_a < id_b) whose strings are within Levenshtein
    distance ``k``. Returns (id_a, id_b, dist)."""
    grams = _gram_hashes(F.col("__s"), q)
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(str_col).alias("__s"),
        F.length(str_col).alias("__len"),
    ).withColumn("__ga", grams).withColumn("__nd", F.size("__ga"))

    long_side = base.filter(F.col("__nd") > k * q)
    short_side = base.filter(F.col("__nd") <= k * q)

    inv = long_side.select(
        "__id", "__len", "__nd", F.explode("__ga").alias("__g")
    )
    a, b = inv.alias("a"), inv.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.__g") == F.col("b.__g"))
            & (F.col("a.__id") < F.col("b.__id"))
            & (F.abs(F.col("a.__len") - F.col("b.__len")) <= F.lit(k)),
        )
        .groupBy(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__nd").alias("nda"),
            F.col("b.__nd").alias("ndb"),
        )
        .agg(F.count("*").alias("__shared"))
        .filter(
            F.col("__shared")
            >= F.greatest(F.col("nda"), F.col("ndb")) - F.lit(k * q)
        )
        .select("id_a", "id_b")
    )

    # vacuous-bound strings: partners at distance k have d ≤ 2·k·q
    partners = base.filter(F.col("__nd") <= 2 * k * q)
    sa, pb = short_side.alias("sa"), partners.alias("pb")
    fallback = sa.join(
        pb,
        (F.col("sa.__id") != F.col("pb.__id"))
        & (F.abs(F.col("sa.__len") - F.col("pb.__len")) <= F.lit(k)),
    ).select(
        F.least("sa.__id", "pb.__id").alias("id_a"),
        F.greatest("sa.__id", "pb.__id").alias("id_b"),
    )

    cand = shared.unionByName(fallback).distinct()
    names = base.select("__id", "__s")
    return (
        cand.join(names.alias("na"), F.col("id_a") == F.col("na.__id"))
        .join(names.alias("nb"), F.col("id_b") == F.col("nb.__id"))
        .withColumn(
            "dist", F.levenshtein(F.col("na.__s"), F.col("nb.__s"))
        )
        .filter(F.col("dist") <= k)
        .select("id_a", "id_b", "dist")
    )

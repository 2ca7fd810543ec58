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


def sorted_neighborhood_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 2,
    window: int = 3,
    prefix_len: int = 4,
    keys: list | None = None,
) -> DataFrame:
    """Sorted-neighborhood record linkage (Hernández & Stolfo,
    SIGMOD 1995 "merge/purge"): the OTHER classic blocking paradigm —
    sort the corpus by a discriminating key and compare each row only
    to its `window−1` successors, instead of inverting grams like
    `edit_distance_self_join`. Complementary failure modes: gram
    blocking degrades on near-identical key spaces (huge shared-gram
    blocks), SNM stays linear there but misses pairs whose sort keys
    diverge early — which is why the method is defined as MULTI-PASS
    (`keys`: one pass per sort key; default [text, reverse(text)],
    the standard head/tail pair). Pairs union across passes, dedupe,
    then verify with exact levenshtein ≤ k.

    Returns (id_a, id_b, dist), id_a < id_b by id.

    Scale: each pass is ONE keyed sort — neighborhoods are windowed
    WITHIN `prefix_len`-character key-prefix partitions (the sort
    parallelizes per prefix; a pair straddling a prefix boundary is
    invisible to that pass, the same boundary loss windowed SNM
    always has — the multi-pass union is the paper's own answer).
    Per row the pass emits `window−1` skinny candidate rows via
    lead(); candidate volume is window-bounded (n·(window−1) per
    pass), never quadratic, with no index to build or broadcast.
    NULL ids/texts are dropped at the door, and a row whose DERIVED
    sort key is NULL is dropped from that pass only (a NULL key would
    gather all NULL rows into one fake neighborhood)."""
    from pyspark.sql import Window

    if window < 2:
        raise ValueError("window must be >= 2")
    # key expressions resolve against the CALLER's columns (so a pass
    # can sort by any derived key, e.g. "concat(zip, name)")
    key_cols = (
        [F.col(text_col), F.reverse(F.col(text_col))]
        if keys is None
        else [F.expr(x) if isinstance(x, str) else x for x in keys]
    )
    passes = []
    for key in key_cols:
        keyed = df.select(
            F.col(id_col).alias("__id"),
            F.col(text_col).alias("__t"),
            key.alias("__key"),
        ).filter(
            F.col("__id").isNotNull()
            & F.col("__t").isNotNull()
            # a custom `keys` expression can be NULL even when id and
            # text are not (e.g. substring of a NULL zip column); such
            # rows would all land in the NULL prefix partition as one
            # fake neighborhood — drop them from THIS pass only (other
            # passes with non-NULL keys still see the row)
            & F.col("__key").isNotNull()
        )
        w = Window.partitionBy(
            F.substring(F.col("__key"), 1, prefix_len)
        ).orderBy(F.col("__key").asc(), F.col("__id").asc())
        cands = keyed.select(
            "__id",
            "__t",
            *[
                F.struct(
                    F.lead("__id", off).over(w).alias("nid"),
                    F.lead("__t", off).over(w).alias("nt"),
                ).alias(f"__n{off}")
                for off in range(1, window)
            ],
        )
        stacked = cands.select(
            "__id",
            "__t",
            F.explode(
                F.array(*[f"__n{off}" for off in range(1, window)])
            ).alias("__n"),
        ).filter(F.col("__n.nid").isNotNull())
        passes.append(
            stacked.select(
                F.least(F.col("__id"), F.col("__n.nid")).alias("id_a"),
                F.greatest(F.col("__id"), F.col("__n.nid")).alias("id_b"),
                F.when(F.col("__id") < F.col("__n.nid"), F.col("__t"))
                .otherwise(F.col("__n.nt"))
                .alias("__ta"),
                F.when(F.col("__id") < F.col("__n.nid"), F.col("__n.nt"))
                .otherwise(F.col("__t"))
                .alias("__tb"),
            )
        )
    allp = passes[0]
    for p in passes[1:]:
        allp = allp.unionByName(p)
    return (
        allp.dropDuplicates(["id_a", "id_b"])
        .withColumn("dist", F.levenshtein("__ta", "__tb"))
        .filter(F.col("dist") <= k)
        .select("id_a", "id_b", "dist")
    )

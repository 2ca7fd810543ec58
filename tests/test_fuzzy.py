"""Edit-distance self-join: recall must be EXACT vs a brute-force
Levenshtein reference (the blocking is provably false-negative-free;
any missing pair is a bug, not a tuning issue).

Parity query: q50 'fuzzy' branch checks the same funnel against a
DuckDB cross-join levenshtein oracle at sf0.01.
"""

from __future__ import annotations

from bigdatabowl2024_25_spark.operators.fuzzy import (
    edit_distance_self_join,
)


def lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


WORDS = [
    "sparkle", "sparkles", "sparkly", "sparble",      # dense cluster
    "catalog", "catalogue", "analog",
    "ababab", "bababa", "ababab2",                    # repeated grams:
    # distinct-gram count is tiny vs positional count — the case a
    # bag-count bound on distinct grams would silently drop
    "ab", "ba", "a", "", "xy",                        # vacuous-bound strings
    "completely-unrelated-string",
]


def test_exact_recall_vs_bruteforce(spark):
    rows = [(i, w) for i, w in enumerate(WORDS)]
    df = spark.createDataFrame(rows, "id bigint, s string")
    for k in (1, 2):
        got = {
            (r.id_a, r.id_b): r.dist
            for r in edit_distance_self_join(df, "id", "s", k=k).collect()
        }
        want = {
            (i, j): lev(WORDS[i], WORDS[j])
            for i in range(len(WORDS))
            for j in range(i + 1, len(WORDS))
            if lev(WORDS[i], WORDS[j]) <= k
        }
        assert got == want, f"k={k}"


def test_partition_invariance(spark):
    rows = [(i, w) for i, w in enumerate(WORDS)]
    a = edit_distance_self_join(
        spark.createDataFrame(rows, "id bigint, s string"), "id", "s", k=2
    )
    b = edit_distance_self_join(
        spark.createDataFrame(rows, "id bigint, s string").repartition(7),
        "id",
        "s",
        k=2,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

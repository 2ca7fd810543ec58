"""Edit-distance self-join: recall must be EXACT vs a brute-force
Levenshtein reference (the blocking is provably false-negative-free;
any missing pair is a bug, not a tuning issue).

Parity query: q50 'fuzzy' branch checks the same funnel against a
DuckDB cross-join levenshtein oracle at sf0.01.
"""

from __future__ import annotations

import pytest

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


@pytest.mark.slow
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


# ---- sorted-neighborhood (merge/purge) -------------------------------

def ref_snm(rows, k, window, prefix_len, keys):
    """From-scratch SNM: per pass, sort by (key, id), neighborhoods
    within prefix partitions, union, verify levenshtein."""
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    pairs = set()
    for keyf in keys:
        keyed = sorted(
            ((keyf(t), i, t) for i, t in rows if t is not None),
        )
        for a in range(len(keyed)):
            for off in range(1, window):
                b = a + off
                if b >= len(keyed):
                    break
                if keyed[a][0][:prefix_len] != keyed[b][0][:prefix_len]:
                    continue
                ia, ta = keyed[a][1], keyed[a][2]
                ib, tb = keyed[b][1], keyed[b][2]
                lo, hi = min(ia, ib), max(ia, ib)
                pairs.add((lo, hi))
    texts = dict(rows)
    return sorted(
        (a, b, lev(texts[a], texts[b]))
        for a, b in pairs
        if lev(texts[a], texts[b]) <= k
    )


def test_snm_matches_python_reference(spark):
    from bigdatabowl2024_25_spark.operators.fuzzy import (
        sorted_neighborhood_self_join,
    )

    rows = [
        (1, "smith john"), (2, "smith jon"), (3, "smyth john"),
        (4, "adams mary"), (5, "adams mary"),  # exact dup -> id tie
        (6, "zzz-corp ltd"), (7, "corp-zzz ltd"),  # reversed-pass case
        (8, None),  # NULL text must vanish, not form a neighborhood
        (9, "adamson m"),
    ]
    df = spark.createDataFrame(rows, "id bigint, name string")
    got = sorted(
        map(
            tuple,
            sorted_neighborhood_self_join(
                df, "id", "name", k=3, window=3, prefix_len=2
            ).collect(),
        )
    )
    want = ref_snm(
        rows, 3, 3, 2, [lambda t: t, lambda t: t[::-1]]
    )
    assert got == want
    # the exact-duplicate pair and the smith cluster must be found
    pairs = {(a, b) for a, b, _ in got}
    assert (4, 5) in pairs and (1, 2) in pairs


def test_snm_multipass_beats_single_pass(spark):
    """'smith john' vs 'smith jon' sort adjacently (forward pass);
    a LEADING typo ('xsmith john') breaks the forward neighborhood
    but the reversed key reunites them — the multi-pass rationale."""
    from bigdatabowl2024_25_spark.operators.fuzzy import (
        sorted_neighborhood_self_join,
    )

    rows = [
        (1, "smith john"), (2, "xsmith john"),
        (3, "aaaa"), (4, "bbbb"), (5, "cccc"), (6, "dddd"),
    ]
    df = spark.createDataFrame(rows, "id bigint, name string")
    single = sorted_neighborhood_self_join(
        df, "id", "name", k=1, window=2, prefix_len=1,
        keys=["name"],
    ).collect()
    assert not any(
        {r.id_a, r.id_b} == {1, 2} for r in single
    )
    both = sorted_neighborhood_self_join(
        df, "id", "name", k=1, window=2, prefix_len=1
    ).collect()
    assert any({r.id_a, r.id_b} == {1, 2} for r in both)


def test_snm_null_derived_key_no_fake_neighborhood(spark):
    """With a custom `keys` expression that is NULL for some rows
    (NULL zip here), those rows must be dropped from THAT pass — not
    collected into one NULL-key partition where two unrelated names
    become window-adjacent and levenshtein-close by accident (the
    r10-ADVICE defect). Rows keep their chance in other passes."""
    from bigdatabowl2024_25_spark.operators.fuzzy import (
        sorted_neighborhood_self_join,
    )

    rows = [
        (1, "abcd", None), (2, "abce", None),   # NULL zip, similar text
        (3, "zzzz", "111"), (4, "zzzy", "111"),
    ]
    df = spark.createDataFrame(rows, "id bigint, name string, zip string")
    # zip-only pass: NULL-zip rows 1,2 must NOT pair (they only look
    # adjacent inside the fake NULL neighborhood)
    zip_pass = sorted_neighborhood_self_join(
        df, "id", "name", k=1, window=2, prefix_len=1,
        keys=["concat(zip, name)"],
    ).collect()
    assert not any({r.id_a, r.id_b} == {1, 2} for r in zip_pass)
    assert any({r.id_a, r.id_b} == {3, 4} for r in zip_pass)
    # a multi-pass run with a non-NULL key still finds 1-2
    both = sorted_neighborhood_self_join(
        df, "id", "name", k=1, window=2, prefix_len=1,
        keys=["concat(zip, name)", "name"],
    ).collect()
    assert any({r.id_a, r.id_b} == {1, 2} for r in both)


def test_snm_partition_invariance(spark):
    from bigdatabowl2024_25_spark.operators.fuzzy import (
        sorted_neighborhood_self_join,
    )

    rows = [(i, f"name {i % 7} v{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "id bigint, name string")
    a = sorted(
        map(
            tuple,
            sorted_neighborhood_self_join(df, "id", "name", k=4).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            sorted_neighborhood_self_join(
                df.repartition(11), "id", "name", k=4
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_snm_plan_no_cartesian(spark):
    """SNM candidates come from lead() windows — the plan must contain
    window exchanges only, never a cartesian/nested-loop pair source."""
    from bigdatabowl2024_25_spark.operators.fuzzy import (
        sorted_neighborhood_self_join,
    )

    df = spark.createDataFrame(
        [(1, "ab"), (2, "ac")], "id bigint, name string"
    )
    plan = (
        sorted_neighborhood_self_join(df, "id", "name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan

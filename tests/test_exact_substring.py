"""ExactSubstr span dedup (`dedup.exact_substring_dedup`, Lee et al.
2022) against a from-the-definition Python reference: repeated
k-token windows keep only the global-min (id, pos) occurrence, loser
spans union, docs rebuild from surviving tokens. The q70 'substr'
branch value-hashes the Spark/DuckDB agreement; this pins the
SEMANTICS and the distribution invariant.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.dedup import exact_substring_dedup

K = 4


def ref_substr(docs, k=K):
    occ = []
    for i, text in sorted(docs):
        w = [t for t in text.split(" ") if t]
        for p in range(len(w) - k + 1):
            occ.append((" ".join(w[p : p + k]), i, p))
    first: dict[str, tuple[int, int]] = {}
    counts: dict[str, int] = {}
    for gram, i, p in sorted(occ, key=lambda t: (t[0], t[1], t[2])):
        counts[gram] = counts.get(gram, 0) + 1
        first.setdefault(gram, (i, p))
    out = {}
    for i, text in sorted(docs):
        w = [t for t in text.split(" ") if t]
        cut = set()
        for p in range(len(w) - k + 1):
            gram = " ".join(w[p : p + k])
            if counts[gram] > 1 and first[gram] != (i, p):
                cut.update(range(p, p + k))
        kept = [w[j] for j in range(len(w)) if j not in cut]
        out[i] = (" ".join(kept), len(kept))
    return out


def run(spark, docs, n_partitions=None):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    if n_partitions:
        df = df.repartition(n_partitions)
    rows = exact_substring_dedup(df, "text", "doc_id", k=K).collect()
    return {r["doc_id"]: (r["text"], r["n_kept"]) for r in rows}


DOCS = [
    (1, "a b c d e f g h"),
    # exact copy: every window loses -> fully cut
    (2, "a b c d e f g h"),
    # shares the 4-window 'c d e f' (plus overlaps) with doc 1 ->
    # the duplicated passage is cut, the unique tail survives
    (3, "c d e f g h x y z"),
    # shorter than k: passes through untouched
    (4, "p q r"),
    # within-doc repeat: the second occurrence of 'm n o p' is cut
    (5, "m n o p z z1 z2 z3 m n o p"),
    # unique doc: untouched
    (6, "u1 u2 u3 u4 u5"),
]


def test_matches_reference_and_planted_fates(spark):
    got = run(spark, DOCS)
    want = ref_substr(DOCS)
    assert got == want
    assert got[1] == ("a b c d e f g h", 8)   # winner keeps all
    assert got[2] == ("", 0)                   # exact copy fully cut
    assert got[3][0] == "x y z"                # unique tail survives
    assert got[4] == ("p q r", 3)              # < k passthrough
    assert got[5][1] == 8                      # 4-token repeat cut once
    assert got[6] == ("u1 u2 u3 u4 u5", 5)


def test_partition_invariance(spark):
    base = run(spark, DOCS)
    for n in (1, 3, 7):
        assert run(spark, DOCS, n_partitions=n) == base


def test_randomized_against_reference(spark):
    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(6)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 14))))
        for i in range(30)
    ]
    assert run(spark, docs) == ref_substr(docs)


def test_no_python_in_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        exact_substring_dedup(df, "text", "doc_id", k=K)
        ._jdf.queryExecution(),
        "formatted",
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # the corpus-sized paths are HashAggregate + window lead-fold;
    # the duplicated-hash groupBy must partially aggregate map-side
    assert "HashAggregate" in plan

"""Paragraph-level dedup (`dedup.paragraph_dedup`) against an
independent pure-Python reference: corpus-wide keep-first at paragraph
granularity with short-paragraph bypass — the CCNet/RefinedWeb
boilerplate-stripping pass.

The q64 'para' branch proves Spark and DuckDB compute the same
keep-first walk; these tests pin the SEMANTICS against a direct
from-the-definition Python implementation on hand-built edge shapes
(within-doc repeats, cross-doc boilerplate, whitespace bypass,
all-duplicate docs dropping, NULL docs vanishing) plus a randomized
corpus, and the distribution invariant (partitioning never changes
the result).
"""

from __future__ import annotations

import pytest

import random
import re

from bigdatabowl2024_25_spark.operators.dedup import paragraph_dedup

SEP = "¶"


def plan_of(df) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def ref_paragraph_dedup(
    docs: list[tuple[int, str | None]],
    sep: str = SEP,
    min_chars: int = 1,
    scope: str = "corpus",
) -> dict[int, tuple[str, int]]:
    """Direct from the definition: walk docs in (id, pos) order, keep
    a paragraph iff it is short (< min_chars NON-WHITESPACE chars —
    the operator's content-not-layout contract) or its exact text is
    unseen (corpus-wide or within the doc, per scope); rebuild each
    doc from its kept paragraphs."""
    seen: set[str] = set()
    out: dict[int, tuple[str, int]] = {}
    for doc_id, text in sorted(docs):
        if text is None:
            continue
        if scope == "document":
            seen = set()
        kept = []
        for para in text.split(sep):
            if len(re.sub(r"\s", "", para)) < min_chars:
                kept.append(para)
            elif para not in seen:
                seen.add(para)
                kept.append(para)
        if kept:
            out[doc_id] = (sep.join(kept), len(kept))
    return out


def run(spark, docs, n_partitions=None, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    if n_partitions:
        df = df.repartition(n_partitions)
    rows = paragraph_dedup(df, "text", "doc_id", sep=SEP, **kw).collect()
    return {r["doc_id"]: (r["text"], r["n_kept"]) for r in rows}


CORPUS = [
    (1, f"alpha beta{SEP}boilerplate footer{SEP}gamma"),
    # loses the footer (doc 1 pos 1 wins) AND "alpha beta" (doc 1
    # pos 0 wins) — keep-first is corpus-wide, not per-doc
    (2, f"delta{SEP}boilerplate footer{SEP}alpha beta"),
    # short paragraphs ('' and ' ') bypass dedup everywhere
    (3, f"{SEP} {SEP}unique-x"),
    (4, f"{SEP} {SEP}unique-y"),
    # within-doc repeat: second 'zz' drops
    (5, f"zz{SEP}zz"),
    # every paragraph already seen -> the whole doc drops
    (6, f"boilerplate footer{SEP}zz"),
    (7, None),
]


def test_matches_reference_on_edge_corpus(spark):
    got = run(spark, CORPUS)
    want = ref_paragraph_dedup(CORPUS)
    assert got == want
    # spot-check the shapes the corpus was built to exercise
    assert got[2] == ("delta", 1)
    assert got[3] == (f"{SEP} {SEP}unique-x", 3)
    assert got[5] == ("zz", 1)
    assert 6 not in got  # all-duplicate doc drops
    assert 7 not in got  # NULL doc vanishes


def test_partitioning_invariance(spark):
    """Keep-first is defined by (id, pos), never by physical row
    order — any repartitioning must produce identical output."""
    base = run(spark, CORPUS)
    for n in (1, 3, 7):
        assert run(spark, CORPUS, n_partitions=n) == base


def test_randomized_against_reference(spark):
    rng = random.Random(8)
    vocab = ["aa", "bb", "cc", "dd", " ", ""]
    docs = [
        (
            i,
            SEP.join(
                rng.choice(vocab) for _ in range(rng.randint(1, 6))
            ),
        )
        for i in range(40)
    ]
    assert run(spark, docs) == ref_paragraph_dedup(docs)


def test_document_scope_keeps_cross_doc_repeats(spark):
    """scope='document' (RefinedWeb intra-doc line removal): the
    footer survives in EVERY doc, only within-doc repeats drop."""
    got = run(spark, CORPUS, scope="document")
    want = ref_paragraph_dedup(CORPUS, scope="document")
    assert got == want
    # doc 2 keeps the footer and 'alpha beta' (cross-doc repeats OK)
    assert got[2] == (f"delta{SEP}boilerplate footer{SEP}alpha beta", 3)
    assert got[5] == ("zz", 1)  # within-doc repeat still drops
    assert got[6] == (f"boilerplate footer{SEP}zz", 2)


def test_randomized_document_scope(spark):
    rng = random.Random(88)
    vocab = ["aa", "bb", "cc", " "]
    docs = [
        (
            i,
            SEP.join(
                rng.choice(vocab) for _ in range(rng.randint(1, 7))
            ),
        )
        for i in range(30)
    ]
    assert run(spark, docs, scope="document") == ref_paragraph_dedup(
        docs, scope="document"
    )


def test_min_chars_widens_bypass(spark):
    """min_chars=3: one- and two-char paragraphs become structural
    (kept everywhere); longer ones still dedup. Eligibility counts
    NON-WHITESPACE characters — 'a b' (2 content chars, trimmed
    length 3) bypasses at min_chars=3, the round-8 ADVICE fix."""
    docs = [
        (1, f"ab{SEP}a b{SEP}long paragraph"),
        (2, f"ab{SEP}a b{SEP}long paragraph"),
    ]
    got = run(spark, docs, min_chars=3)
    assert got == ref_paragraph_dedup(docs, min_chars=3)
    assert got[2] == (f"ab{SEP}a b", 2)


def test_plan_two_skew_resistant_shuffles(spark):
    """The claimed shape: exactly two exchanges (winner groupBy +
    doc reassembly) and partial aggregation present, so a boilerplate
    hot key collapses map-side instead of co-locating in one window
    partition."""
    df = spark.createDataFrame(CORPUS[:6], "doc_id long, text string")
    plan = plan_of(paragraph_dedup(df, "text", "doc_id", sep=SEP))
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 2
    assert "HashAggregate" in plan
    assert "Window" not in plan


@pytest.mark.slow
def test_hypothesis_reference_parity(spark):
    """Property: for ANY corpus over a small alphabet (maximizing
    collisions, empties, and whitespace-only paragraphs), both scopes
    equal the from-the-definition reference walk."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    para = st.sampled_from(["aa", "bb", "cc aa", " ", "", "aa bb"])
    corpus = st.lists(
        st.lists(para, min_size=1, max_size=5),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=15, deadline=None)
    @given(corpus)
    def check(paras_per_doc):
        docs = [
            (i, SEP.join(ps)) for i, ps in enumerate(paras_per_doc)
        ]
        for scope in ("corpus", "document"):
            assert run(spark, docs, scope=scope) == ref_paragraph_dedup(
                docs, scope=scope
            )

    check()

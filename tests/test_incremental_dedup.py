"""Incremental dedup — the daily-crawl update path: new batches dedup
against running state (8-byte content keys / banded LSH rows), never
against re-loaded history text, and never re-pair history with itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.dedup import (
    incremental_exact_dedup,
    incremental_lsh_candidates,
    lsh_candidates,
    minhash_signatures,
    with_shingles,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_exact_dedup(spark):
    day1 = _docs(
        spark,
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, "eta theta")],
    )
    empty = spark.createDataFrame([], "content_key long")
    s1, keys1 = incremental_exact_dedup(day1, empty, "text", "doc_id")
    assert {r.doc_id for r in s1.collect()} == {1, 2, 3}
    assert keys1.count() == 3

    day2 = _docs(
        spark,
        [
            (10, "alpha beta gamma"),     # exact dup of history → dropped
            (11, "new content here"),     # fresh → survives
            (12, "new content here"),     # batch-internal dup → keep-min
            (13, "ALPHA beta GAMMA!"),    # normalized dup of history
        ],
    )
    s2rows = incremental_exact_dedup(day2, keys1, "text", "doc_id")
    s2, keys2 = s2rows
    got2 = s2.collect()
    assert {r.doc_id for r in got2} == {11}
    assert got2[0].n_copies == 2  # 11 and 12 shared the content
    assert keys2.count() == 4  # 3 history + 1 new key

    # idempotence: replaying day2 against the updated keys drops all
    s3, keys3 = incremental_exact_dedup(day2, keys2, "text", "doc_id")
    assert s3.count() == 0 and keys3.count() == 4


def test_incremental_exact_dedup_reserved_column_guard(spark):
    """Regression (ADVICE r7): a batch already carrying `content_key`
    (e.g. survivors of a prior pass re-fed) must fail loudly — the
    stale column would silently corrupt the join/filter logic."""
    import pytest

    empty = spark.createDataFrame([], "content_key long")
    for col in ("content_key", "n_copies", "__keep"):
        tainted = spark.createDataFrame(
            [(1, "alpha", 7)], f"doc_id long, text string, {col} long"
        )
        with pytest.raises(ValueError, match=col.replace("__", "")):
            incremental_exact_dedup(tainted, empty, "text", "doc_id")


def test_incremental_lsh_candidates_no_history_pairs(spark):
    """Cross-era and intra-batch collisions are produced; history ×
    history pairs are NOT (their work is already done), and the
    cross-era candidate set matches the full-rebuild funnel's pairs
    restricted to pairs touching the new batch."""
    base = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely different words about spark and shuffles here"),
    ]
    newb = [
        # near-dup of doc 1 (tail tweak) → should band-collide with it
        (10, "the quick brown fox jumps over the lazy dog again and often"),
        # exact text of doc 2 under a new id
        (11, "completely different words about spark and shuffles here"),
        (12, "nothing like anything else in this corpus at all folks"),
    ]
    hist = _docs(spark, base)
    new = _docs(spark, newb)

    # build history band state the same way arrival would have
    _, hist_banded = incremental_lsh_candidates(
        hist, spark.createDataFrame([], "doc string, band_key string"),
        "doc_id",
    )
    cands, new_banded = incremental_lsh_candidates(
        new, hist_banded, "doc_id"
    )
    got = {(r.id_a, r.id_b) for r in cands.collect()}
    # no history×history pair ever
    assert not any(a in {1, 2} and b in {1, 2} for a, b in got)
    # every pair touches the new batch
    assert all(a >= 10 or b >= 10 for a, b in got)
    # exact copy must collide with its original
    assert (2, 11) in got

    # parity with a full rebuild, restricted to pairs touching new ids
    full = lsh_candidates(
        minhash_signatures(
            with_shingles(_docs(spark, base + newb), "text", "doc_id"),
            "doc_id",
        ),
        "doc_id",
    )
    want = {
        (r.id_a, r.id_b)
        for r in full.collect()
        if r.id_a >= 10 or r.id_b >= 10
    }
    assert got == want


def test_bloom_prefiltered_path_is_identical(spark):
    """The seen_bloom prefilter must be semantically invisible: for
    any batch, (survivors, updated keys) equal the plain anti-join
    path exactly — no false negatives means certainly-new rows skip
    the join losslessly. Also pins the two-tier split: with a Bloom
    over day-1 keys, only the true re-crawls (plus deterministic FPs
    — none at this load) reach the 'maybe' side."""
    from bigdatabowl2024_25_spark.operators.sketch import (
        bloom_build,
        bloom_literal,
        bloom_maybe_contains,
    )
    from bigdatabowl2024_25_spark.operators.text import (
        normalize_text,
        portable_hash64,
    )

    day1 = _docs(
        spark,
        [(i, f"doc number {i} words {i * 7}") for i in range(40)],
    )
    empty = spark.createDataFrame([], "content_key long")
    s1, keys1 = incremental_exact_dedup(day1, empty, "text", "doc_id")
    keys1 = keys1.localCheckpoint()
    bloom = bloom_literal(bloom_build(keys1, "content_key"))

    day2 = _docs(
        spark,
        # 5 exact re-crawls of day 1, 5 fresh, 1 within-batch dup pair
        [(100 + i, f"doc number {i} words {i * 7}") for i in range(5)]
        + [(200 + i, f"fresh page {i} content") for i in range(5)]
        + [(300, "twin page"), (301, "twin page")],
    )
    plain_s, plain_k = incremental_exact_dedup(
        day2, keys1, "text", "doc_id"
    )
    bloom_s, bloom_k = incremental_exact_dedup(
        day2, keys1, "text", "doc_id", seen_bloom=bloom
    )
    key = lambda df: sorted(
        (r.doc_id, r.content_key, r.n_copies) for r in df.collect()
    )
    assert key(bloom_s) == key(plain_s)
    assert sorted(r.content_key for r in bloom_k.collect()) == sorted(
        r.content_key for r in plain_k.collect()
    )
    assert {r.doc_id for r in bloom_s.collect()} == {
        200, 201, 202, 203, 204, 300
    }

    # the split itself: exactly the 5 re-crawl keys are 'maybe seen'
    h = portable_hash64(normalize_text(F.col("text")))
    maybe = day2.withColumn("content_key", h).filter(
        bloom_maybe_contains(bloom, F.col("content_key"))
    )
    assert {r.doc_id for r in maybe.collect()} == {100, 101, 102, 103, 104}


def test_best_quality_survivors(spark):
    """Quality-aware keeper: highest score wins its cluster (tie ->
    min id); unclustered rows always survive; the corpus-side plan
    must stay broadcast-only (no corpus shuffle)."""
    from bigdatabowl2024_25_spark.operators.dedup import (
        best_quality_survivors,
    )

    corpus = spark.createDataFrame(
        [
            (1, "short"), (2, "much longer text here"),   # cluster A
            (3, "mid size"),                              # unclustered
            (4, "same len"), (5, "same len"),             # cluster B tie
        ],
        "doc_id long, text string",
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (4, 4), (5, 4)], "node long, component long"
    )
    out = best_quality_survivors(
        corpus, comp, "doc_id", F.length("text")
    )
    assert {r.doc_id for r in out.collect()} == {2, 3, 4}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every corpus-side join is a broadcast — the only exchanges in
    # the plan belong to the funnel-sized keeper election groupBy,
    # never to a corpus-side sort-merge join
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan

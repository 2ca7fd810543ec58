"""Linear quality classifier: integer-exact scoring vs a pure-Python
reference, keep-rule boundaries, and a train→quantize→score roundtrip.

Parity query: q60's qcls_logit/qcls_keep columns re-derive the same
pinned-weight scoring in DuckDB list/md5 SQL at sf0.01.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.quality_clf import (
    quality_keep,
    quantize_weights,
    text_logit_scaled,
    train_quality_weights,
)

DIM = 32
W = [((i * 2654435761) % 2001) - 1000 for i in range(DIM)]


def py_bucket(tok: str, dim: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % dim


def py_logit(text: str, w: list[int]) -> int:
    return sum(w[py_bucket(t, len(w))] for t in text.split(" ") if t)


def test_logit_matches_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "single",
        "",
        "a a a repeated a tokens a",
        "punctuation, mixed! tokens? here",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = df.select(
        "text", text_logit_scaled(F.col("text"), W).alias("s")
    ).collect()
    for r in got:
        assert r.s == py_logit(r.text, W), r.text


def test_quality_keep_boundary_and_empty(spark):
    # one-token docs: keep iff w[bucket] >= threshold*scale exactly
    df = spark.createDataFrame(
        [("tok%d" % i,) for i in range(20)] + [("",)], "text string"
    )
    thr = 0.1  # scaled: 100000 — far above the |w|<=1000 test weights
    got = df.select(
        "text",
        quality_keep(F.col("text"), W, threshold=0.0).alias("k0"),
        quality_keep(F.col("text"), W, threshold=thr).alias("kt"),
    ).collect()
    for r in got:
        if not r.text:
            assert r.k0 is False and r.kt is False  # empty: never keep
        else:
            assert r.k0 == (py_logit(r.text, W) >= 0)
            assert r.kt == (py_logit(r.text, W) >= 100000)


def test_train_quantize_score_roundtrip(spark):
    # separable corpus: 'good' vocab vs 'bad' vocab
    rows = []
    for i in range(60):
        if i % 2 == 0:
            rows.append((i, "insight essay careful prose insight essay", 1))
        else:
            rows.append((i, "click spam buy click spam buy now", 0))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, label int")
    w, b = train_quality_weights(
        df, "text", "label", "doc_id", dim=DIM, max_iter=25
    )
    ws = quantize_weights(w)
    # decision rule: mean token weight >= -intercept
    got = df.select(
        "label",
        quality_keep(F.col("text"), ws, threshold=-b).alias("keep"),
    ).collect()
    assert all(bool(r.keep) == bool(r.label) for r in got)

"""DSIR importance-resampling selection (`operators.dsir`) and the
Gopher rule filter (`text.gopher_rules`): python-reference parity,
exact partition invariance, selection semantics, and plan pins."""

from __future__ import annotations

import hashlib
import math
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.dsir import (
    dsir_bucket_counts,
    dsir_features,
    dsir_model,
    dsir_resample,
    dsir_weights,
)
from bigdatabowl2024_25_spark.operators.text import gopher_rules

DIM = 64
ALPHA = 1.0


# ---- python reference ---------------------------------------------------


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _norm(text: str) -> str:
    import re

    t = re.sub(r"[^a-z0-9 ]", "", text.lower())
    return re.sub(r" +", " ", t).strip()


def _feats(text: str) -> list[str]:
    w = [t for t in _norm(text).split(" ") if t != ""]
    return w + [f"{a} {b}" for a, b in zip(w, w[1:])]


def _ref_weights(docs, target_ids):
    """(id → (n_feats, logw Decimal)) via the published recipe with
    the engine's quantization: each ln rounded once to 15 dp."""
    tcnt: dict[int, int] = {}
    rcnt: dict[int, int] = {}
    for i, text in docs:
        for f in _feats(text):
            b = _h64(f) % DIM
            rcnt[b] = rcnt.get(b, 0) + 1
            if i in target_ids:
                tcnt[b] = tcnt.get(b, 0) + 1
    tt, tr = float(sum(tcnt.values())), float(sum(rcnt.values()))

    def lr(b: int) -> Decimal:
        pt = (tcnt.get(b, 0) + ALPHA) / (tt + ALPHA * DIM)
        pr = (rcnt.get(b, 0) + ALPHA) / (tr + ALPHA * DIM)
        return _dec15(math.log(pt)) - _dec15(math.log(pr))

    out = {}
    for i, text in docs:
        fs = _feats(text)
        if not fs:
            continue
        out[i] = (len(fs), sum((lr(_h64(f) % DIM) for f in fs), Decimal(0)))
    return out


def _dec15(x: float) -> Decimal:
    """double → decimal(38,15) the way Spark CASTs: via the shortest
    round-trip string (Double.toString ≡ Python repr), then
    HALF_UP at scale 15 — NOT the exact binary expansion."""
    from decimal import ROUND_HALF_UP

    return Decimal(repr(x)).quantize(Decimal("1e-15"), rounding=ROUND_HALF_UP)


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog ate the cat food"),
    (2, "alpha beta gamma delta epsilon"),
    (3, "stock prices rose sharply today after the announcement"),
    (4, "the cat and the dog are friends"),
    (5, "zeta eta theta iota kappa lambda"),
]
TARGET = {0, 1, 4}  # the "cat/dog English" distribution


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def weights(spark, corpus):
    tgt = corpus.filter(F.col("doc_id").isin(*TARGET))
    model = dsir_model(
        dsir_bucket_counts(tgt, "text", DIM),
        dsir_bucket_counts(corpus, "text", DIM),
        dim=DIM,
        alpha=ALPHA,
    )
    return dsir_weights(corpus, "text", "doc_id", model, dim=DIM)


def test_weights_match_python_reference(weights):
    got = {r["doc_id"]: (r["n_feats"], r["logw"]) for r in weights.collect()}
    ref = _ref_weights(DOCS, TARGET)
    assert set(got) == set(ref)
    for i in ref:
        assert got[i][0] == ref[i][0], f"doc {i} n_feats"
        # python's libm ln may differ from the JVM's Math.log by a few
        # ulp per term (JVM log is not correctly rounded; the ENGINES
        # agree — DuckDB parity is exact, only this python
        # re-derivation drifts), which after the 15-dp quantize is a
        # few 1e-15 per feature term; any STRUCTURAL error (hashing,
        # counts, smoothing, totals) shifts logw by ≫1e-12
        tol = Decimal("5e-15") * ref[i][0]
        assert abs(got[i][1] - ref[i][1]) <= tol, (
            f"doc {i} logw {got[i][1]} vs {ref[i][1]}"
        )


def test_target_like_docs_score_higher(weights):
    w = {r["doc_id"]: float(r["logw"]) / r["n_feats"] for r in weights.collect()}
    # per-feature importance: every target-distribution doc beats every
    # off-distribution greek/finance doc
    assert min(w[0], w[1], w[4]) > max(w[2], w[3], w[5])


def test_model_is_complete_and_broadcast(weights, spark, corpus):
    tgt = corpus.filter(F.col("doc_id").isin(*TARGET))
    model = dsir_model(
        dsir_bucket_counts(tgt, "text", DIM),
        dsir_bucket_counts(corpus, "text", DIM),
        dim=DIM,
        alpha=ALPHA,
    )
    assert model.count() == DIM
    assert model.filter(F.col("lr").isNull()).count() == 0
    plan = weights._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_partition_invariance(spark, corpus, weights):
    base = {r["doc_id"]: r["logw"] for r in weights.collect()}
    shuffled = corpus.repartition(7)
    tgt = shuffled.filter(F.col("doc_id").isin(*TARGET)).coalesce(1)
    model = dsir_model(
        dsir_bucket_counts(tgt, "text", DIM),
        dsir_bucket_counts(shuffled, "text", DIM),
        dim=DIM,
        alpha=ALPHA,
    )
    again = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(shuffled, "text", "doc_id", model, dim=DIM).collect()
    }
    assert base == again  # exact decimal equality, any partitioning


def test_empty_doc_absent(spark):
    d = spark.createDataFrame(
        [(0, "some real text here"), (1, "")], "doc_id long, text string"
    )
    model = dsir_model(
        dsir_bucket_counts(d.filter("doc_id = 0"), "text", DIM),
        dsir_bucket_counts(d, "text", DIM),
        dim=DIM,
    )
    ids = [
        r["doc_id"]
        for r in dsir_weights(d, "text", "doc_id", model, dim=DIM).collect()
    ]
    assert ids == [0]


def test_alpha_zero_rejected(spark, corpus):
    with pytest.raises(ValueError, match="alpha"):
        dsir_model(
            dsir_bucket_counts(corpus, "text", DIM),
            dsir_bucket_counts(corpus, "text", DIM),
            dim=DIM,
            alpha=0.0,
        )


# ---- resampling ---------------------------------------------------------


def test_resample_deterministic_subset(weights):
    a = sorted(r["doc_id"] for r in dsir_resample(weights, "doc_id", k=3).collect())
    b = sorted(r["doc_id"] for r in dsir_resample(weights, "doc_id", k=3).collect())
    assert a == b and len(a) == 3
    all_ids = {r["doc_id"] for r in weights.collect()}
    assert set(a) <= all_ids


@pytest.mark.slow
def test_resample_biased_toward_high_weight(weights):
    # across 30 seeds, target-like docs (higher logw) must be drawn
    # strictly more often than off-distribution ones
    hits = {i: 0 for i, _ in DOCS}
    for s in range(30):
        for r in dsir_resample(weights, "doc_id", k=2, seed=f"t:{s}").collect():
            hits[r["doc_id"]] += 1
    like = hits[0] + hits[1] + hits[4]
    unlike = hits[2] + hits[3] + hits[5]
    assert like > unlike


def test_resample_plan_is_topk(weights):
    plan = (
        dsir_resample(weights, "doc_id", k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_lambda_zero_ignores_weights(weights):
    # λ=0 degenerates to uniform hash sampling: selection must be a
    # pure function of the seed, independent of logw
    sel = dsir_resample(weights, "doc_id", k=3, lam=0.0)
    doubled = weights.withColumn("logw", F.col("logw") * 2)
    sel2 = dsir_resample(doubled, "doc_id", k=3, lam=0.0)
    assert sorted(r["doc_id"] for r in sel.collect()) == sorted(
        r["doc_id"] for r in sel2.collect()
    )


# ---- gopher rules -------------------------------------------------------


def _gopher_row(spark, text, **kw):
    d = spark.createDataFrame([(0, text)], "doc_id long, text string")
    g = gopher_rules(F.col("text"), **kw)
    return d.select(
        *[v.alias(k) for k, v in g.items()]
    ).collect()[0]


GOOD = (
    "the quick brown fox jumps over that lazy dog and runs to have "
    "fun with friends of his pack be cause today is a fine day for "
    "running and jumping and playing in the field with all of the "
    "other animals that have come to join in the games near the old barn"
)


def test_gopher_good_doc_keeps(spark):
    r = _gopher_row(spark, GOOD)
    assert r["gopher_keep"] is True
    assert r["gopher_mask"] == (1 << 7) - 1


def test_gopher_word_count_bounds(spark):
    r = _gopher_row(spark, "too short")
    assert r["r_word_count"] is False and r["gopher_keep"] is False
    r = _gopher_row(spark, "three ok words", min_words=3)
    assert r["r_word_count"] is True


def test_gopher_symbol_ratio(spark):
    bad = GOOD + " " + "# # # # # # # # # # # # # # # # # # # # # # #"
    r = _gopher_row(spark, bad)
    assert r["r_symbol"] is False


def test_gopher_bullet_and_ellipsis_lines(spark):
    body = GOOD.split(" ")
    bullets = "\n".join(f"- {w}" for w in body)
    r = _gopher_row(spark, bullets)
    assert r["r_bullet"] is False
    ell = "\n".join(f"{w}..." for w in body)
    r = _gopher_row(spark, ell)
    assert r["r_ellipsis"] is False
    assert r["r_symbol"] is False  # ellipses are symbols too


def test_gopher_alpha_and_stopwords(spark):
    nums = " ".join(str(i) for i in range(60))
    r = _gopher_row(spark, nums)
    assert r["r_alpha"] is False and r["r_stopwords"] is False
    r = _gopher_row(spark, GOOD)
    assert r["r_alpha"] is True and r["r_stopwords"] is True


def test_gopher_mean_word_length(spark):
    short = " ".join(["a b"] * 30)
    r = _gopher_row(spark, short)
    assert r["r_word_len"] is False


def test_gopher_no_python_in_plan(spark):
    d = spark.createDataFrame([(0, GOOD)], "doc_id long, text string")
    g = gopher_rules(F.col("text"))
    plan = (
        d.select(g["gopher_mask"], g["gopher_keep"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan


# ---- gopher fuzz vs python reference ------------------------------------


def _gopher_ref(text: str, min_words=50, max_words=100_000):
    """Independent python re-derivation of the seven rules."""
    import re

    w = [t for t in text.split(" ") if t != ""]
    n = len(w)
    chars = sum(len(t) for t in w)
    n_sym = len(re.findall("#", text)) + len(re.findall(r"\.\.\.", text))
    lines = text.split("\n")
    n_lines = len(lines)
    n_bullet = sum(1 for ln in lines if re.search(r"^[-*•]", ln.lstrip()))
    n_ell = sum(1 for ln in lines if re.search(r"\.\.\.$", ln.rstrip()))
    n_alpha = sum(1 for t in w if re.search("[A-Za-z]", t))
    req = ("the", "be", "to", "of", "and", "that", "have", "with")
    n_req = sum(1 for s in req if s in w)
    rules = [
        min_words <= n <= max_words,
        3 * n <= chars <= 10 * n,
        10 * n_sym <= n,
        10 * n_bullet <= 9 * n_lines,
        10 * n_ell <= 3 * n_lines,
        5 * n_alpha >= 4 * n,
        n_req >= 2,
    ]
    return sum(1 << i for i, r in enumerate(rules) if r)


@pytest.mark.slow
def test_gopher_fuzz_vs_reference(spark):
    """Randomized documents spanning every rule's boundary — bullets,
    ellipses, symbols, numeric tokens, required stopwords, newlines —
    must produce the identical rule bitmask as the python reference."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.one_of(
        st.sampled_from(
            ["the", "be", "to", "of", "and", "cat", "x", "42", "#",
             "...", "foo...", "-", "aaaaaaaaaaaa", "ab"]
        ),
        st.text(alphabet="ab1#.", min_size=1, max_size=6),
    )
    line = st.lists(word, min_size=0, max_size=12).map(" ".join)
    doc = st.lists(line, min_size=1, max_size=4).map("\n".join)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=8))
    def run(texts):
        d = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        g = gopher_rules(F.col("text"), min_words=3)
        got = {
            r["doc_id"]: r["m"]
            for r in d.select("doc_id", g["gopher_mask"].alias("m")).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == _gopher_ref(t, min_words=3), (
                f"mask mismatch for {t!r}: spark={got[i]} "
                f"ref={_gopher_ref(t, min_words=3)}"
            )

    run()

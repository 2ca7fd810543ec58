"""Model artifact persistence (round 13): save/load roundtrips for
the quality-classifier weights, the bigram LM count tables, and all
four NumPy model families — loaded-model scores pinned BIT-IDENTICAL
to fresh-model scores (IEEE-64 end to end), plus the loud-guard
contract (unknown family, unfitted model, corrupted/gap-ranked
artifacts)."""

from __future__ import annotations

import random

import pytest

from bigdatabowl2024_25_spark.operators.model_io import (
    load_lm,
    load_model,
    load_quality_weights,
    save_lm,
    save_model,
    save_quality_weights,
)


def _probs(pred):
    return sorted(
        (
            r.doc_id if hasattr(r, "doc_id") else None,
            r.predicted_label,
            tuple(sorted(r.probabilities.items())),
        )
        for r in pred.collect()
    )


def _clf_frame(spark, n=240):
    random.seed(13)
    rows = [
        (
            i,
            f"c{i % 3}",
            (i % 3) * 3.0 + random.gauss(0, 0.5),
            -(i % 3) * 2.0 + random.gauss(0, 0.5),
            ["red", "green", "blue"][i % 3] if i % 7 else None,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lab string, f1 double, f2 double, color string"
    )


def test_quality_weights_roundtrip_and_guards(spark, tmp_path):
    w = [0.125, -3.0, 1e-17, 0.1 + 0.2]  # incl. a non-representable sum
    p = str(tmp_path / "qw")
    save_quality_weights(spark, p, w, -0.75)
    lw, li = load_quality_weights(spark, p)
    assert lw == w and li == -0.75  # bit-exact, order preserved
    assert all(type(x) is float for x in lw)

    with pytest.raises(ValueError, match="empty"):
        save_quality_weights(spark, str(tmp_path / "x"), [], 0.0)
    with pytest.raises(ValueError, match="non-numeric"):
        save_quality_weights(spark, str(tmp_path / "x"), [0.1, "a"], 0.0)
    with pytest.raises(ValueError, match="non-numeric"):
        save_quality_weights(spark, str(tmp_path / "x"), [0.1], True)
    # a weight-rank gap is a corrupted artifact → loud
    import pyspark.sql.functions as F

    gp = str(tmp_path / "gap")
    spark.read.parquet(p).filter(
        (F.col("part") != "weight") | (F.col("rank") != 1)
    ).write.parquet(gp)
    with pytest.raises(ValueError, match="missing weight ranks"):
        load_quality_weights(spark, gp)
    # a tokenizer artifact is not a quality artifact
    from bigdatabowl2024_25_spark.operators.tokenizer_io import (
        save_tokenizer,
    )

    tp = str(tmp_path / "tok")
    save_tokenizer(spark, tp, "bpe", [("a", "b")])
    with pytest.raises(ValueError):
        load_quality_weights(spark, tp)


def test_quality_scores_survive_roundtrip(spark, tmp_path):
    """End-to-end: weights trained by train_quality_weights, saved,
    loaded, quantized — loaded-model document scores ≡ fresh-model
    scores (the exact int64 logit path)."""
    from bigdatabowl2024_25_spark.operators.quality_clf import (
        quantize_weights,
        text_logit_scaled,
        train_quality_weights,
    )

    docs = spark.createDataFrame(
        [
            (i, ("good clean prose " if i % 2 else "spam spam buy ") * 4,
             i % 2)
            for i in range(40)
        ],
        "doc_id long, text string, label int",
    )
    w, b = train_quality_weights(
        docs, "text", "label", "doc_id", dim=64, max_iter=20
    )
    p = str(tmp_path / "qclf")
    save_quality_weights(spark, p, w, b)
    lw, lb = load_quality_weights(spark, p)
    fresh = docs.select(
        "doc_id",
        text_logit_scaled("text", quantize_weights(w)).alias("logit"),
    ).collect()
    loaded = docs.select(
        "doc_id",
        text_logit_scaled("text", quantize_weights(lw)).alias("logit"),
    ).collect()
    assert sorted((r.doc_id, r.logit) for r in fresh) == sorted(
        (r.doc_id, r.logit) for r in loaded
    )
    assert lb == b


def test_lm_roundtrip_perplexity_identical(spark, tmp_path):
    from bigdatabowl2024_25_spark.operators.ngram_lm import (
        lm_perplexity,
        lm_train,
    )

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat on the log"),
            (2, "a cat and a dog"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    bigrams, contexts, vocab = lm_train(docs, "text", "doc_id")
    p = str(tmp_path / "lm")
    save_lm(spark, p, bigrams, contexts, vocab)
    lb, lc, lv = load_lm(spark, p)

    # count tables round-trip exactly (int64)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(lb) == key(bigrams)
    assert key(lc) == key(contexts)
    assert lv.first().v == vocab.first().v

    # scoring with the loaded model is bit-identical
    fresh = lm_perplexity(
        docs, "text", "doc_id", bigrams, contexts, vocab
    ).collect()
    loaded = lm_perplexity(docs, "text", "doc_id", lb, lc, lv).collect()
    assert sorted(map(tuple, fresh)) == sorted(map(tuple, loaded))

    # vocab-row cardinality guard
    import pyspark.sql.functions as F

    bad = str(tmp_path / "lm_bad")
    spark.read.parquet(p).filter(F.col("part") != "vocab").write.parquet(
        bad
    )
    with pytest.raises(ValueError, match="vocab rows"):
        load_lm(spark, bad)


@pytest.mark.parametrize("family", ["mlp", "gbdt", "lgbm", "catboost"])
def test_numpy_family_roundtrip_bit_identical(spark, tmp_path, family):
    from bigdatabowl2024_25_spark.ml import (
        NumpyCatBoostClassifier,
        NumpyGBDTClassifier,
        NumpyLGBMClassifier,
        NumpyMLPClassifier,
    )

    df = _clf_frame(spark)
    model = {
        "mlp": lambda: NumpyMLPClassifier(
            "lab", ["f1", "f2"], hidden=(8,), epochs=30
        ),
        "gbdt": lambda: NumpyGBDTClassifier(
            "lab", ["f1", "f2"], n_rounds=5, max_depth=2
        ),
        "lgbm": lambda: NumpyLGBMClassifier(
            "lab", ["f1", "f2"], n_rounds=5, num_leaves=4
        ),
        "catboost": lambda: NumpyCatBoostClassifier(
            "lab", ["f1", "f2"], n_rounds=5, depth=2,
            cat_feature_cols=["color"], n_permutations=2,
        ),
    }[family]().fit(df)
    p = str(tmp_path / family)
    save_model(spark, p, model)
    loaded = load_model(spark, p)
    assert type(loaded) is type(model)
    assert loaded.classes_ == model.classes_
    assert loaded.feature_cols == model.feature_cols
    # loaded-model scores ≡ fresh-model scores, bit for bit
    assert _probs(loaded.transform(df)) == _probs(model.transform(df))
    # refit hyperparameters survive (spot check the scoring-critical
    # and a refit-only one per family)
    if family == "mlp":
        assert loaded.hidden == (8,) and loaded.epochs == 30
    else:
        assert loaded.learning_rate == model.learning_rate
        assert loaded.n_rounds == 5
    if family == "catboost":
        assert loaded.cat_feature_cols == ["color"]
        assert loaded.n_permutations == 2
        assert (loaded.ts_prior_ == model.ts_prior_).all()


def test_model_io_guards(spark, tmp_path):
    from bigdatabowl2024_25_spark.ml import NumpyGBDTClassifier

    with pytest.raises(ValueError, match="unknown family"):
        save_model(spark, str(tmp_path / "x"), object())
    with pytest.raises(ValueError, match="not fitted"):
        save_model(
            spark, str(tmp_path / "x"),
            NumpyGBDTClassifier("lab", ["f1"]),
        )
    # an artifact of a different layer is rejected loudly
    from bigdatabowl2024_25_spark.operators.tokenizer_io import (
        save_tokenizer,
    )

    tp = str(tmp_path / "tok")
    save_tokenizer(spark, tp, "bpe", [("a", "b")])
    with pytest.raises(ValueError, match="lacks artifact columns"):
        load_model(spark, tp)
    # tree-count / class-count consistency guard
    df = _clf_frame(spark, n=60)
    m = NumpyGBDTClassifier(
        "lab", ["f1", "f2"], n_rounds=2, max_depth=1
    ).fit(df)
    p = str(tmp_path / "m")
    save_model(spark, p, m)
    import pyspark.sql.functions as F

    bad = str(tmp_path / "m_bad")
    spark.read.parquet(p).filter(
        (F.col("part") != "tree") | (F.col("rank") != 0)
    ).write.parquet(bad)
    with pytest.raises(ValueError, match="trees"):
        load_model(spark, bad)


def test_round13_edge_hardening(spark, tmp_path):
    """Round-13 proactive edge pass on the round's own surface:
    non-finite quality weights rejected loudly; degenerate model
    shapes (a stump-depth GBDT, an MLP with NO hidden layers)
    roundtrip bit-exactly; CatBoost without categoricals roundtrips
    through the same artifact shape."""
    import math

    import numpy as np

    with pytest.raises(ValueError, match="non-finite"):
        save_quality_weights(
            spark, str(tmp_path / "x"), [0.1, float("nan")], 0.0
        )
    with pytest.raises(ValueError, match="non-finite"):
        save_quality_weights(
            spark, str(tmp_path / "x"), [0.1], float("inf")
        )

    from bigdatabowl2024_25_spark.ml import (
        NumpyCatBoostClassifier,
        NumpyGBDTClassifier,
        NumpyMLPClassifier,
    )

    df = _clf_frame(spark, n=80)
    # stump-class GBDT (max_depth=1) and a no-hidden-layer MLP
    for name, m in (
        ("stump", NumpyGBDTClassifier(
            "lab", ["f1", "f2"], n_rounds=2, max_depth=1).fit(df)),
        ("mlp0", NumpyMLPClassifier(
            "lab", ["f1", "f2"], hidden=(), epochs=10).fit(df)),
        ("cb_nocat", NumpyCatBoostClassifier(
            "lab", ["f1", "f2"], n_rounds=2, depth=1).fit(df)),
    ):
        p = str(tmp_path / name)
        save_model(spark, p, m)
        loaded = load_model(spark, p)
        assert _probs(loaded.transform(df)) == _probs(m.transform(df)), name
    assert load_model(spark, str(tmp_path / "mlp0")).hidden == ()


def test_review_fix_corrupt_artifacts_are_valueerror(spark, tmp_path):
    """Round-13 review fix: every corrupt-artifact shape surfaces as
    the documented ValueError, never a bare KeyError/TypeError from
    the rebuild comprehensions (callers' except-ValueError fallbacks
    depend on it)."""
    import pyspark.sql.functions as F

    from bigdatabowl2024_25_spark.ml import (
        NumpyGBDTClassifier,
        NumpyMLPClassifier,
    )

    df = _clf_frame(spark, n=60)
    mlp_p = str(tmp_path / "mlp")
    save_model(
        spark, mlp_p,
        NumpyMLPClassifier("lab", ["f1", "f2"], hidden=(4,), epochs=5)
        .fit(df),
    )
    # drop one mu row -> ValueError, not KeyError
    bad1 = str(tmp_path / "mlp_bad")
    spark.read.parquet(mlp_p).filter(
        (F.col("part") != "mu") | (F.col("i") != 0)
    ).write.parquet(bad1)
    with pytest.raises(ValueError, match="mu/sd"):
        load_model(spark, bad1)

    gb_p = str(tmp_path / "gb")
    save_model(
        spark, gb_p,
        NumpyGBDTClassifier("lab", ["f1", "f2"], n_rounds=1, max_depth=1)
        .fit(df),
    )
    # NULL out a tree field's value -> ValueError, not TypeError
    bad2 = str(tmp_path / "gb_bad")
    art = spark.read.parquet(gb_p)
    art.withColumn(
        "dval",
        F.when(
            (F.col("part") == "tree") & (F.col("key") == "thr")
            & (F.col("i") == 0) & (F.col("rank") == 0),
            F.lit(None).cast("double"),
        ).otherwise(F.col("dval")),
    ).write.parquet(bad2)
    with pytest.raises(ValueError, match="NULL"):
        load_model(spark, bad2)


def test_review_fix_mlp_weight_corruption_is_valueerror(spark, tmp_path):
    """Round-13 second-review fix: MLP W/b rows with NULL values (the
    corruption shape already pinned for trees) surface as ValueError
    too."""
    import pyspark.sql.functions as F

    from bigdatabowl2024_25_spark.ml import NumpyMLPClassifier

    df = _clf_frame(spark, n=60)
    p = str(tmp_path / "mlp")
    save_model(
        spark, p,
        NumpyMLPClassifier("lab", ["f1", "f2"], hidden=(4,), epochs=5)
        .fit(df),
    )
    bad = str(tmp_path / "mlp_w_bad")
    spark.read.parquet(p).withColumn(
        "dval",
        F.when(
            (F.col("part") == "W") & (F.col("rank") == 0)
            & (F.col("i") == 0) & (F.col("j") == 0),
            F.lit(None).cast("double"),
        ).otherwise(F.col("dval")),
    ).write.parquet(bad)
    with pytest.raises(ValueError, match="W row holds NULL"):
        load_model(spark, bad)


def test_uniform_api_mllib_pipeline_roundtrip(spark, tmp_path):
    """Round 14: the SAME save_model/load_model surface covers the
    MLlib families — a fitted classifier_pipeline PipelineModel
    roundtrips through the marker-table dispatch with loaded scores
    identical to the fresh fit's."""
    from pyspark.ml import PipelineModel

    from bigdatabowl2024_25_spark.ml import classifier_pipeline

    df = _clf_frame(spark, n=120)
    fitted = classifier_pipeline(
        "lab", ["f1", "f2"], n_trees=5, max_depth=3
    ).fit(df)
    p = str(tmp_path / "rf")
    save_model(spark, p, fitted)
    loaded = load_model(spark, p)
    assert isinstance(loaded, PipelineModel)
    fresh = sorted(
        (r.doc_id, r.prediction, tuple(r.probability))
        for r in fitted.transform(df)
        .select("doc_id", "prediction", "probability").collect()
    )
    back = sorted(
        (r.doc_id, r.prediction, tuple(r.probability))
        for r in loaded.transform(df)
        .select("doc_id", "prediction", "probability").collect()
    )
    assert back == fresh
    # overwrite the SAME path with a numpy-family artifact: the
    # parquet overwrite wipes the dir, so dispatch must flip back
    from bigdatabowl2024_25_spark.ml import NumpyGBDTClassifier

    m = NumpyGBDTClassifier("lab", ["f1", "f2"], n_rounds=3,
                            max_depth=2).fit(df)
    save_model(spark, p, m)
    assert type(load_model(spark, p)) is NumpyGBDTClassifier


def test_uniform_api_rule_coverage_roundtrip(spark, tmp_path):
    import pyspark.sql.functions as F

    from bigdatabowl2024_25_spark.ml import (
        RuleCoverageModel,
        classifier_pipeline,
    )

    m = RuleCoverageModel(
        feature="f1", threshold=2.5, classes=("Cover-1", "other"),
        p_hit=0.8,
    )
    p = str(tmp_path / "rule")
    save_model(spark, p, m)
    loaded = load_model(spark, p)
    assert type(loaded) is RuleCoverageModel
    assert (loaded.feature, loaded.threshold, loaded.classes,
            loaded.p_hit) == ("f1", 2.5, ("Cover-1", "other"), 0.8)
    df = _clf_frame(spark, n=20)
    assert (
        sorted(map(str, m.transform(df).collect()))
        == sorted(map(str, loaded.transform(df).collect()))
    )
    # incomplete rule artifact → loud ValueError
    bad = str(tmp_path / "rule_bad")
    spark.read.parquet(p).filter(
        ~((F.col("part") == "rule") & (F.col("key") == "threshold"))
    ).write.parquet(bad)
    with pytest.raises(ValueError, match="incomplete"):
        load_model(spark, bad)
    # corrupted marker family on an mllib-layout artifact
    mk = str(tmp_path / "marker_bad")
    save_model(
        spark, mk,
        classifier_pipeline("lab", ["f1"], n_trees=2, max_depth=2)
        .fit(_clf_frame(spark, n=30)),
    )
    # materialize before overwriting the SAME path (lazy read would
    # see its own deletion)
    tampered = spark.read.parquet(f"{mk}/model_io_meta").withColumn(
        "sval", F.lit("EvilModel")
    )
    rows_t, schema_t = tampered.collect(), tampered.schema
    spark.createDataFrame(rows_t, schema_t).write.mode(
        "overwrite"
    ).parquet(f"{mk}/model_io_meta")
    with pytest.raises(ValueError, match="marker names family"):
        load_model(spark, mk)


def test_cross_family_tamper_is_valueerror(spark, tmp_path):
    """Round-14 edge audit: an artifact saved by one family whose
    meta row is tampered to name ANOTHER family must raise a loud
    ValueError (the named family's parts are missing), never build a
    model off mismatched parts."""
    import pyspark.sql.functions as F

    from bigdatabowl2024_25_spark.ml import NumpyGBDTClassifier

    df = _clf_frame(spark, n=60)
    p = str(tmp_path / "gbdt")
    save_model(
        spark, p,
        NumpyGBDTClassifier("lab", ["f1", "f2"], n_rounds=3,
                            max_depth=2).fit(df),
    )
    tam = str(tmp_path / "gbdt_as_mlp")
    spark.read.parquet(p).withColumn(
        "sval",
        F.when(
            (F.col("part") == "meta") & (F.col("key") == "family"),
            F.lit("NumpyMLPClassifier"),
        ).otherwise(F.col("sval")),
    ).write.parquet(tam)
    with pytest.raises(ValueError):
        load_model(spark, tam)

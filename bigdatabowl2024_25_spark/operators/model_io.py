"""Trained-model artifact persistence (round 13) — the
`tokenizer_io` pattern extended to the remaining trained state: the
quality-classifier weights (`quality_clf.train_quality_weights`), the
bigram LM count tables (`ngram_lm.lm_train`), and the NumPy model
families (`ml.NumpyMLPClassifier` / `NumpyGBDTClassifier` /
`NumpyLGBMClassifier` / `NumpyCatBoostClassifier`).

A production pipeline trains ONCE (the expensive corpus/driver fit)
and scores everywhere — so every learned artifact needs a durable,
engine-portable, typed representation. The reference retrains in
place each session (R scripts + notebooks, no persistence anywhere);
this layer is part of the LLM-pipeline surface the repo adds.

Format: one parquet table per artifact with the superset schema

    part string, rank bigint, i bigint, j bigint,
    key string, sval string, dval double, lval bigint

where each part uses its own columns and leaves the rest NULL.
Doubles are IEEE-64 in parquet, so float state round-trips
BIT-EXACTLY — loaded-model scores are pinned ≡ fresh-model scores in
tests/test_model_io.py, not tolerance-banded.

Scale split, deliberate:
- model artifacts (weights, trees, TS tables) are KB-sized →
  driver-built rows + repartition(1) write (the tokenizer_io
  rationale verbatim: repartition, NOT coalesce — the measured
  4.1-4.3 s empty-parent-slice stall).
- LM COUNT TABLES are corpus-derived DataFrames (vocab²-bounded but
  potentially GBs before pruning) → saved as a DISTRIBUTED union
  write with no collect and loaded back as DataFrames, so the
  train-once/score-many story holds at 100 TB.

Round 14 makes the API uniform across all 8 model families: fitted
MLlib PipelineModels (rf / logreg / gbt_ovr pipelines) route through
`save_model`/`load_model` too — delegating to Spark's native MLWriter
under `{path}/mllib` with a marker table at `{path}/model_io_meta`
for dispatch — and `RuleCoverageModel` persists its rule
configuration, so ONE save/load call works for every model the
engine can produce (loaded transform ≡ fresh transform, pinned per
family in tests/test_model_io.py).
"""

from __future__ import annotations

import numbers

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = (
    "part string, rank bigint, i bigint, j bigint, "
    "key string, sval string, dval double, lval bigint"
)

_NULLROW = {
    "rank": None, "i": None, "j": None,
    "key": None, "sval": None, "dval": None, "lval": None,
}


def _row(part: str, **kw) -> tuple:
    d = dict(_NULLROW, **kw)
    return (
        part, d["rank"], d["i"], d["j"],
        d["key"], d["sval"], d["dval"], d["lval"],
    )


def _write_small(spark: SparkSession, path: str, rows: list) -> None:
    # repartition(1), NOT coalesce(1) — tokenizer_io's measured stall
    spark.createDataFrame(rows, _SCHEMA).repartition(1).write.mode(
        "overwrite"
    ).parquet(path)


_COLS = ("part", "rank", "i", "j", "key", "sval", "dval", "lval")


def _read_artifact(spark: SparkSession, path: str, caller: str) -> DataFrame:
    """Read + schema-gate: an artifact of a DIFFERENT layer (e.g. a
    tokenizer_io file) must fail as a loud ValueError, not an
    AnalysisException deep in a select."""
    df = spark.read.parquet(path)
    missing = [c for c in _COLS if c not in df.columns]
    if missing:
        raise ValueError(
            f"{caller}: {path} lacks artifact columns {missing} — not "
            "a model_io artifact (wrong persistence layer?)"
        )
    return df


# ------------------------------------------------------ quality clf

def save_quality_weights(
    spark: SparkSession, path: str, weights: list[float], intercept: float
) -> None:
    """Persist a `train_quality_weights` result (dim floats + the
    intercept). The weight order IS the bucket index, carried as an
    explicit rank column — a reordered load would silently mis-score
    every document, so `load_quality_weights` restores by rank and
    rejects gaps."""
    if not weights:
        raise ValueError("save_quality_weights: empty weight vector")
    import math

    # finiteness matters, not just type: a NaN weight would roundtrip
    # as NaN and then poison every logit it touches downstream, with
    # the artifact itself looking healthy (NaN != NaN also breaks any
    # later equality audit silently)
    bad = [
        (i, w) for i, w in enumerate(weights)
        if isinstance(w, bool)
        or not isinstance(w, numbers.Real)
        or not math.isfinite(float(w))
    ]
    if bad:
        raise ValueError(
            f"save_quality_weights: non-numeric/non-finite weights "
            f"{bad[:3]}"
        )
    if (
        isinstance(intercept, bool)
        or not isinstance(intercept, numbers.Real)
        or not math.isfinite(float(intercept))
    ):
        raise ValueError(
            f"save_quality_weights: non-numeric/non-finite intercept "
            f"{intercept!r}"
        )
    rows = [
        _row("weight", rank=i, dval=float(w))
        for i, w in enumerate(weights)
    ]
    rows.append(_row("intercept", dval=float(intercept)))
    _write_small(spark, path, rows)


def load_quality_weights(
    spark: SparkSession, path: str
) -> tuple[list[float], float]:
    """Read back (weights, intercept) bit-identical to what
    `save_quality_weights` was handed. Raises on empty, gap-ranked, or
    intercept-less artifacts — each means a corrupted file, and
    scoring with it would be silently wrong."""
    rows = _read_artifact(
        spark, path, "load_quality_weights"
    ).select("part", "rank", "dval").collect()
    ws = {r.rank: r.dval for r in rows if r.part == "weight"}
    icpts = [r.dval for r in rows if r.part == "intercept"]
    if not ws or len(icpts) != 1:
        raise ValueError(
            f"load_quality_weights: {path} is not a quality-weight "
            f"artifact ({len(ws)} weights, {len(icpts)} intercepts)"
        )
    if sorted(ws) != list(range(len(ws))):
        raise ValueError(
            f"load_quality_weights: {path} has missing weight ranks"
        )
    return [ws[i] for i in range(len(ws))], icpts[0]


# ------------------------------------------------------ bigram LM

def save_lm(
    spark: SparkSession,
    path: str,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab: DataFrame,
) -> None:
    """Persist a `lm_train` model — the (prev, tok, cb) bigram counts,
    (prev, cu) context counts, and the one-row vocab size — as ONE
    parquet dataset, written DISTRIBUTED (no collect, no
    repartition(1)): the count tables are vocab²-bounded but can be
    GBs before pruning at corpus scale, and counts are int64 so the
    roundtrip is exact by construction."""
    big = bigrams.select(
        F.lit("bigram").alias("part"),
        F.lit(None).cast("bigint").alias("rank"),
        F.lit(None).cast("bigint").alias("i"),
        F.lit(None).cast("bigint").alias("j"),
        F.col("prev").alias("key"),
        F.col("tok").alias("sval"),
        F.lit(None).cast("double").alias("dval"),
        F.col("cb").cast("bigint").alias("lval"),
    )
    ctx = contexts.select(
        F.lit("context").alias("part"),
        F.lit(None).cast("bigint").alias("rank"),
        F.lit(None).cast("bigint").alias("i"),
        F.lit(None).cast("bigint").alias("j"),
        F.col("prev").alias("key"),
        F.lit(None).cast("string").alias("sval"),
        F.lit(None).cast("double").alias("dval"),
        F.col("cu").cast("bigint").alias("lval"),
    )
    voc = vocab.select(
        F.lit("vocab").alias("part"),
        F.lit(None).cast("bigint").alias("rank"),
        F.lit(None).cast("bigint").alias("i"),
        F.lit(None).cast("bigint").alias("j"),
        F.lit(None).cast("string").alias("key"),
        F.lit(None).cast("string").alias("sval"),
        F.lit(None).cast("double").alias("dval"),
        F.col("v").cast("bigint").alias("lval"),
    )
    big.unionByName(ctx).unionByName(voc).write.mode(
        "overwrite"
    ).parquet(path)


def load_lm(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Read back (bigrams, contexts, vocab) as DataFrames with the
    exact `lm_train` column names/types, ready for `lm_perplexity`.
    The vocab part is validated eagerly (it is one row by contract —
    a missing or multiplied vocab row means a corrupted artifact and
    every α·V smoothing term would be wrong); the count tables stay
    lazy and distributed."""
    art = _read_artifact(spark, path, "load_lm")
    bigrams = art.filter(F.col("part") == "bigram").select(
        F.col("key").alias("prev"),
        F.col("sval").alias("tok"),
        F.col("lval").alias("cb"),
    )
    contexts = art.filter(F.col("part") == "context").select(
        F.col("key").alias("prev"),
        F.col("lval").alias("cu"),
    )
    vocab = art.filter(F.col("part") == "vocab").select(
        F.col("lval").alias("v")
    )
    n_voc = vocab.count()
    if n_voc != 1:
        raise ValueError(
            f"load_lm: {path} holds {n_voc} vocab rows (expected "
            "exactly 1) — not an lm_train artifact or corrupted"
        )
    return bigrams, contexts, vocab


# ------------------------------------------------------ NumPy models

#: refit hyperparameters persisted per family (typed: float → dval,
#: int → lval, bool → lval 0/1). Scoring needs only learning_rate
#: (tree families); the rest make the loaded instance refit-faithful.
_HYPERS: dict[str, list[tuple[str, type]]] = {
    "NumpyMLPClassifier": [
        ("epochs", int), ("lr", float), ("l2", float), ("seed", int),
        ("max_fit_rows", int),
    ],
    "NumpyGBDTClassifier": [
        ("n_rounds", int), ("max_depth", int), ("learning_rate", float),
        ("reg_lambda", float), ("gamma", float),
        ("min_child_weight", float), ("max_fit_rows", int),
    ],
    "NumpyLGBMClassifier": [
        ("n_rounds", int), ("num_leaves", int), ("learning_rate", float),
        ("reg_lambda", float), ("min_child_weight", float),
        ("min_data_in_leaf", int), ("max_bin", int),
        ("max_fit_rows", int),
    ],
    "NumpyCatBoostClassifier": [
        ("n_rounds", int), ("depth", int), ("learning_rate", float),
        ("reg_lambda", float), ("max_borders", int), ("ordered", bool),
        ("seed", int), ("max_fit_rows", int), ("n_permutations", int),
        ("prior_weight", float),
    ],
}

_TREE_FIELDS = ("feat", "thr", "left", "right", "val")


def save_model(spark: SparkSession, path: str, model) -> None:
    """Persist a FITTED NumPy-family classifier (MLP / GBDT / LGBM /
    CatBoost) — classes, feature columns, hyperparameters, and the
    full scoring state (MLP layer matrices + scaler; tree-family flat
    arrays; CatBoost target-statistic tables) — as typed parquet rows.
    Everything float is IEEE-64 end to end, so `load_model(...)
    .transform(df)` is pinned bit-identical to the fresh fit's
    transform. Raises on an unfitted model (no classes_) and on
    families outside the registry — silent pickle-style opacity is
    exactly what this layer replaces."""
    family = type(model).__name__
    # ---- uniform-API dispatch (round 14): ONE save/load surface for
    # all 8 model families. MLlib PipelineModels delegate to Spark's
    # native MLWriter under {path}/mllib plus a marker table at
    # {path}/model_io_meta (so load_model can route without guessing
    # from directory shape); RuleCoverageModel persists its rule
    # configuration as typed rows. A numpy-family overwrite of the
    # same path wipes the whole dir (parquet overwrite semantics), so
    # the two layouts can never coexist stale.
    from pyspark.ml import PipelineModel

    if isinstance(model, PipelineModel):
        # the numpy→mllib direction needs an explicit wipe: MLWriter
        # only replaces {path}/mllib, so a numpy-family artifact's
        # root-level part-*.parquet would survive and a raw
        # spark.read.parquet(path) would still yield the stale model
        jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            for st in fs.listStatus(jpath):
                if st.getPath().getName() not in (
                    "mllib", "model_io_meta"
                ):
                    fs.delete(st.getPath(), True)
        model.write().overwrite().save(f"{path}/mllib")
        _write_small(
            spark,
            f"{path}/model_io_meta",
            [_row("meta", key="family", sval="PipelineModel")],
        )
        return
    if family == "RuleCoverageModel":
        # configuration, not fitted state — persisted so the X9
        # inference path has the same train-once/score-anywhere story
        rows = [
            _row("meta", key="family", sval=family),
            _row("rule", key="feature", sval=model.feature),
            _row("rule", key="threshold", dval=float(model.threshold)),
            _row("rule", key="p_hit", dval=float(model.p_hit)),
        ] + [
            _row("class", rank=r, sval=c)
            for r, c in enumerate(model.classes)
        ]
        _write_small(spark, path, rows)
        return
    if family not in _HYPERS:
        raise ValueError(
            f"save_model: unknown family {family!r} (supported: "
            f"{sorted(_HYPERS) + ['PipelineModel', 'RuleCoverageModel']})"
        )
    if not hasattr(model, "classes_"):
        raise ValueError(
            f"save_model: {family} instance is not fitted (no "
            "classes_) — call fit() before saving"
        )
    rows = [
        _row("meta", key="family", sval=family),
        _row("meta", key="label_col", sval=model.label_col),
    ]
    for name, typ in _HYPERS[family]:
        v = getattr(model, name)
        if typ is float:
            rows.append(_row("hyper", key=name, dval=float(v)))
        else:  # int / bool → lval
            rows.append(_row("hyper", key=name, lval=int(v)))
    rows += [
        _row("feature_col", rank=r, sval=c)
        for r, c in enumerate(model.feature_cols)
    ]
    rows += [
        _row("class", rank=r, sval=c)
        for r, c in enumerate(model.classes_)
    ]
    if family == "NumpyMLPClassifier":
        rows += [
            _row("mu", i=i, dval=float(v))
            for i, v in enumerate(model.mu_)
        ]
        rows += [
            _row("sd", i=i, dval=float(v))
            for i, v in enumerate(model.sd_)
        ]
        for layer, (W, b) in enumerate(model.layers_):
            rows += [
                _row("W", rank=layer, i=i, j=j, dval=float(W[i, j]))
                for i in range(W.shape[0])
                for j in range(W.shape[1])
            ]
            rows += [
                _row("b", rank=layer, i=i, dval=float(v))
                for i, v in enumerate(b)
            ]
    else:
        k = len(model.classes_)
        for rnd, round_trees in enumerate(model.trees_):
            for c, tree in enumerate(round_trees):
                feat, thr, left, right, val = tree
                t = rnd * k + c
                for n in range(len(feat)):
                    rows += [
                        _row("tree", rank=t, i=n, key="feat",
                             lval=int(feat[n])),
                        _row("tree", rank=t, i=n, key="thr",
                             dval=float(thr[n])),
                        _row("tree", rank=t, i=n, key="left",
                             lval=int(left[n])),
                        _row("tree", rank=t, i=n, key="right",
                             lval=int(right[n])),
                        _row("tree", rank=t, i=n, key="val",
                             dval=float(val[n])),
                    ]
        if family == "NumpyCatBoostClassifier":
            rows += [
                _row("cat_feature_col", rank=r, sval=c)
                for r, c in enumerate(model.cat_feature_cols)
            ]
            if model.cat_feature_cols:
                rows += [
                    _row("ts_prior", i=i, dval=float(v))
                    for i, v in enumerate(model.ts_prior_)
                ]
                for col in model.cat_feature_cols:
                    keys = model.ts_keys_[col]
                    table = model.ts_tables_[col]
                    rows += [
                        _row("ts_key", key=col, rank=i, sval=str(s))
                        for i, s in enumerate(keys)
                    ]
                    rows += [
                        _row("ts_table", key=col, i=i, j=j,
                             dval=float(table[i, j]))
                        for i in range(table.shape[0])
                        for j in range(table.shape[1])
                    ]
    _write_small(spark, path, rows)


def _ranked(items: dict[int, str], what: str, path: str) -> list[str]:
    if sorted(items) != list(range(len(items))):
        raise ValueError(
            f"load_model: {path} has missing {what} ranks — corrupted "
            "or hand-edited artifact"
        )
    return [items[i] for i in range(len(items))]


def load_model(spark: SparkSession, path: str):
    """Read a `save_model` artifact back as a FITTED instance of the
    original class: same classes/features/hyperparameters, scoring
    state restored bit-exactly (transform ≡ the fresh fit's transform,
    pinned in tests). Raises on unknown family, missing parts, or
    rank gaps."""
    import numpy as np

    from pyspark.errors import AnalysisException

    from .. import ml

    # uniform-API dispatch: an MLlib artifact announces itself via the
    # marker table (probed first — a bare numpy-artifact path has no
    # such subdir and the probe misses cleanly)
    try:
        marker = _read_artifact(
            spark, f"{path}/model_io_meta", "load_model"
        ).collect()
    except AnalysisException:
        marker = None
    if marker is not None:
        fam = {
            r.key: r.sval for r in marker if r.part == "meta"
        }.get("family")
        if fam != "PipelineModel":
            raise ValueError(
                f"load_model: {path} marker names family {fam!r} — "
                "corrupted artifact"
            )
        from pyspark.ml import PipelineModel

        return PipelineModel.load(f"{path}/mllib")
    rows = _read_artifact(spark, path, "load_model").collect()
    meta = {r.key: r.sval for r in rows if r.part == "meta"}
    family = meta.get("family")
    if family == "RuleCoverageModel":
        rule = {r.key: r for r in rows if r.part == "rule"}
        classes = _ranked(
            {r.rank: r.sval for r in rows if r.part == "class"},
            "class", path,
        )
        missing = {"feature", "threshold", "p_hit"} - set(rule)
        if missing or len(classes) != 2 or (
            rule["feature"].sval is None
            or rule["threshold"].dval is None
            or rule["p_hit"].dval is None
        ):
            raise ValueError(
                f"load_model: {path} RuleCoverageModel artifact is "
                f"incomplete (missing {sorted(missing) or 'values'})"
            )
        return ml.RuleCoverageModel(
            feature=rule["feature"].sval,
            threshold=float(rule["threshold"].dval),
            classes=(classes[0], classes[1]),
            p_hit=float(rule["p_hit"].dval),
        )
    if family not in _HYPERS:
        raise ValueError(
            f"load_model: {path} holds family {family!r} — not a "
            "save_model artifact or unsupported"
        )
    hyper_rows = {r.key: r for r in rows if r.part == "hyper"}
    kwargs = {}
    for name, typ in _HYPERS[family]:
        if name not in hyper_rows:
            raise ValueError(
                f"load_model: {path} is missing hyperparameter {name}"
            )
        r = hyper_rows[name]
        kwargs[name] = (
            float(r.dval) if typ is float
            else bool(r.lval) if typ is bool
            else int(r.lval)
        )
    feature_cols = _ranked(
        {r.rank: r.sval for r in rows if r.part == "feature_col"},
        "feature_col", path,
    )
    classes = _ranked(
        {r.rank: r.sval for r in rows if r.part == "class"},
        "class", path,
    )
    if family == "NumpyCatBoostClassifier":
        kwargs["cat_feature_cols"] = _ranked(
            {r.rank: r.sval for r in rows if r.part == "cat_feature_col"},
            "cat_feature_col", path,
        ) or None
    cls = getattr(ml, family)
    if family == "NumpyMLPClassifier":
        # hidden is derivable from the layer shapes; constructor gets
        # it below once layers are rebuilt
        mu = {r.i: r.dval for r in rows if r.part == "mu"}
        sd = {r.i: r.dval for r in rows if r.part == "sd"}
        if (
            None in mu or None in sd  # NULL index would break sorted()
            or sorted(mu) != list(range(len(mu)))
            or sorted(sd) != list(range(len(sd)))
            or not mu or len(mu) != len(sd)
            or None in mu.values() or None in sd.values()
        ):
            raise ValueError(
                f"load_model: {path} MLP mu/sd parts are incomplete "
                "— corrupted artifact"
            )
        Ws: dict[int, dict[tuple[int, int], float]] = {}
        bs: dict[int, dict[int, float]] = {}
        for r in rows:
            if r.part == "W":
                if r.rank is None or r.i is None or r.j is None or (
                    r.dval is None
                ):
                    raise ValueError(
                        f"load_model: {path} W row holds NULL — "
                        "corrupted artifact"
                    )
                Ws.setdefault(r.rank, {})[(r.i, r.j)] = r.dval
            elif r.part == "b":
                if r.rank is None or r.i is None or r.dval is None:
                    raise ValueError(
                        f"load_model: {path} b row holds NULL — "
                        "corrupted artifact"
                    )
                bs.setdefault(r.rank, {})[r.i] = r.dval
        if not Ws or set(Ws) != set(bs):
            raise ValueError(
                f"load_model: {path} MLP layer parts are incomplete"
            )
        layers = []
        for layer in range(len(Ws)):
            wd, bd = Ws[layer], bs[layer]
            n_in = 1 + max(i for i, _ in wd)
            n_out = 1 + max(j for _, j in wd)
            # dense-grid completeness: np.empty would silently ship
            # uninitialized memory for any interior cell the artifact
            # lost, violating the loud-ValueError contract
            if len(wd) != n_in * n_out or len(bd) != n_out:
                raise ValueError(
                    f"load_model: {path} MLP layer {layer} has "
                    f"{len(wd)}/{n_in * n_out} W cells and "
                    f"{len(bd)}/{n_out} b cells — corrupted artifact"
                )
            W = np.empty((n_in, n_out))
            for (i, j), v in wd.items():
                W[i, j] = v
            b = np.empty(n_out)
            for i, v in bd.items():
                b[i] = v
            layers.append((W, b))
        hidden = tuple(W.shape[1] for W, _ in layers[:-1])
        model = cls(
            meta["label_col"], feature_cols, hidden=hidden, **kwargs
        )
        model.classes_ = classes
        model.mu_ = np.array([mu[i] for i in range(len(mu))])
        model.sd_ = np.array([sd[i] for i in range(len(sd))])
        model.layers_ = layers
        return model
    model = cls(meta["label_col"], feature_cols, **kwargs)
    model.classes_ = classes
    k = len(classes)
    nodes: dict[int, dict[int, dict[str, float]]] = {}
    for r in rows:
        if r.part == "tree":
            v = r.lval if r.lval is not None else r.dval
            if v is None:
                raise ValueError(
                    f"load_model: {path} tree node field {r.key!r} "
                    "holds NULL — corrupted artifact"
                )
            nodes.setdefault(r.rank, {}).setdefault(r.i, {})[r.key] = v
    if not nodes or len(nodes) % k != 0:
        raise ValueError(
            f"load_model: {path} holds {len(nodes)} trees — not a "
            f"multiple of {k} classes; corrupted artifact"
        )
    trees: list[list[tuple]] = []
    for t in range(len(nodes)):
        if t not in nodes:
            raise ValueError(
                f"load_model: {path} has missing tree rank {t}"
            )
        tn = nodes[t]
        order = range(len(tn))
        try:
            tree = (
                np.array([int(tn[n]["feat"]) for n in order]),
                np.array([float(tn[n]["thr"]) for n in order]),
                np.array([int(tn[n]["left"]) for n in order]),
                np.array([int(tn[n]["right"]) for n in order]),
                np.array([float(tn[n]["val"]) for n in order]),
            )
        except KeyError as exc:
            raise ValueError(
                f"load_model: {path} tree {t} is missing node field "
                f"{exc}"
            ) from None
        if t % k == 0:
            trees.append([])
        trees[-1].append(tree)
    model.trees_ = trees
    if family == "NumpyCatBoostClassifier" and model.cat_feature_cols:
        prior = {r.i: r.dval for r in rows if r.part == "ts_prior"}
        if None in prior or sorted(prior) != list(
            range(len(prior))
        ) or not prior or None in prior.values():
            raise ValueError(
                f"load_model: {path} ts_prior part is incomplete — "
                "corrupted artifact"
            )
        model.ts_prior_ = np.array([prior[i] for i in range(len(prior))])
        model.ts_keys_ = {}
        model.ts_tables_ = {}
        model.ts_maps_ = {}
        for col in model.cat_feature_cols:
            ks = _ranked(
                {
                    r.rank: r.sval
                    for r in rows
                    if r.part == "ts_key" and r.key == col
                },
                f"ts_key[{col}]", path,
            )
            cells = {
                (r.i, r.j): r.dval
                for r in rows
                if r.part == "ts_table" and r.key == col
            }
            # same dense-grid check as the MLP layers: a missing or
            # NULL interior cell must raise, not read np.empty garbage
            if len(cells) != len(ks) * k or None in cells.values():
                raise ValueError(
                    f"load_model: {path} ts_table[{col}] has "
                    f"{len(cells)}/{len(ks) * k} cells — corrupted "
                    "artifact"
                )
            table = np.empty((len(ks), k))
            for (i, j), v in cells.items():
                table[i, j] = v
            model.ts_keys_[col] = np.array(ks, dtype=object)
            model.ts_tables_[col] = table
            model.ts_maps_[col] = {
                s: table[i].copy() for i, s in enumerate(ks)
            }
    return model

"""ML layer (SURVEY.md §2.9 X4-X9): the two notebook classifiers
re-expressed with Spark MLlib.

- DefCoverage.ipynb: play-level coverage classifier — features are
  per-play defender aggregates (pivot + multi-stat, cells 2-4) +
  situational play columns; 18-class RandomForest (cell 5).
- DefPosModel.ipynb: per-defender assignment classifier — start/end
  positions, distance aggregates in the pre-snap window (cell 1);
  19-class RandomForest (cell 4).

Feature building is the Spark-scale part (59M tracking rows); model
fitting happens on the resulting ≤44k-row feature table, for which
MLlib's RandomForest is plenty (the notebooks' sklearn/xgboost are not
in this environment — metrics are tolerance bands per SURVEY.md §5,
not hash targets).

X4 LabelEncoder → StringIndexer; X5 train_test_split(seed=42) →
randomSplit(seed=42); X7 StandardScaler → MLlib StandardScaler;
X8 metrics → MulticlassClassificationEvaluator.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import (
    GBTClassifier,
    LogisticRegression,
    OneVsRest,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import StandardScaler, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42

#: X6 model families, mirroring the reference's comparison set
#: (`DefPosModel.ipynb` cell 16 trains RF / XGBoost / CatBoost /
#: LightGBM / LogReg, cell 10 a Keras MLP; xgboost & friends are not
#: in this environment, so the boosted entries are MLlib GBT via
#: OneVsRest — GBTClassifier is binary-only — plus the pure-NumPy
#: second-order softprob `NumpyGBDTClassifier` (the XGBoost algorithm
#: itself, multiclass + calibrated probabilities), the leaf-wise
#: histogram `NumpyLGBMClassifier` (the LightGBM algorithm), and the
#: oblivious-tree ordered-boosting `NumpyCatBoostClassifier` (the
#: CatBoost algorithm); the linear entry is multinomial
#: LogisticRegression, and the neural entry is the pure-NumPy
#: `NumpyMLPClassifier` below).
MODEL_FAMILIES = ("rf", "logreg", "gbt_ovr", "mlp", "gbdt", "lgbm", "catb")


def _fit_frame(
    df: DataFrame,
    cls_name: str,
    label_col: str,
    feature_cols: list[str],
    max_fit_rows: int,
    extra_cols: list[str] | None = None,
):
    """Driver-collect gate shared by the NumPy model families. Their
    contract (SURVEY X6) is a DRIVER-SIZED aggregated feature table —
    the same ≤44k-row frame the reference feeds sklearn/xgboost/Keras
    — and this count makes that contract ENFORCEABLE rather than
    documentary: a corpus-scale DataFrame pointed at `.fit` dies
    loudly with a redirect instead of OOMing the driver through
    `toPandas` (round-10 review item). The count is one cheap
    aggregate job; the frame is then collected exactly once.

    Also centralizes the input validations every family needs (empty
    frame, NULL labels, non-finite features) with the messages the
    test suite pins."""
    import numpy as np

    n = df.count()
    if n > max_fit_rows:
        raise ValueError(
            f"{cls_name}.fit: training frame has {n:,} rows — over "
            f"the max_fit_rows={max_fit_rows:,} driver-collect bound. "
            "These families fit driver-sized AGGREGATED feature "
            "tables; for corpus-scale training use the distributed "
            "MLlib families (classifier_pipeline model='rf'/'logreg'/"
            "'gbt_ovr') or aggregate/sample first."
        )
    # extra_cols ride along in the collected frame (e.g. CatBoost's
    # categorical columns) but stay out of X and its finiteness checks
    pdf = df.select(label_col, *feature_cols, *(extra_cols or [])).toPandas()
    if pdf.empty:
        raise ValueError(f"{cls_name}.fit: empty training frame")
    if pdf[label_col].isna().any():
        raise ValueError(
            f"{cls_name}.fit: NULL labels — filter or impute before "
            "fitting"
        )
    X = pdf[feature_cols].to_numpy(dtype=np.float64)
    if not np.isfinite(X).all():
        raise ValueError(
            f"{cls_name}.fit: non-finite feature values — a NaN "
            "silently poisons standardization means and every "
            "comparison on its feature's sort path; clean or clip "
            "first"
        )
    return pdf, X


def _stddev_exact(c: str):
    """Sample stddev via explicit moment sums:
    sqrt((Σx² − (Σx)²/n) / (n−1)). Semantically stddev_samp, but
    cross-engine-EXACT on dyadic inputs: the built-in's streaming
    central-moment updates divide at every step and round differently
    between engines, while here every addend is exactly representable
    (tracking coords are ¼-multiples), the sums are order-free, and
    the remaining ops are single IEEE roundings identical in any
    engine — which is what lets the q92 feature-table parity query be
    value-hash-checked instead of tolerance-banded. Numerically fine
    at field scale (|x| ≤ 120 ⇒ no catastrophic cancellation)."""
    n = F.count(F.col(c))
    sx = F.sum(F.col(c))
    sxx = F.sum(F.col(c) * F.col(c))
    # n=1 guard: (n-1)=0 would NULL-divide (or raise under ANSI mode)
    # on any play with a single tracked defender; explicit NULL keeps
    # the semantics ANSI-safe and unambiguous (stddev of one sample is
    # undefined — downstream imputers treat NULL, not NaN)
    return F.when(
        n > 1, F.sqrt((sxx - sx * sx / n) / (n - F.lit(1)))
    ).otherwise(F.lit(None).cast("double"))


def coverage_features(
    tracking: DataFrame, plays: DataFrame, players: DataFrame
) -> DataFrame:
    """Play-level features (`DefCoverage.ipynb` cells 1-4): per-play
    defender position/speed aggregates + situational columns; label =
    pff_passCoverage."""
    defenders = tracking.join(
        F.broadcast(plays.select("gameId", "playId", "defensiveTeam")),
        ["gameId", "playId"],
    ).filter(F.col("club") == F.col("defensiveTeam"))
    agg = defenders.groupBy("gameId", "playId").agg(
        F.avg("x").alias("def_x_mean"),
        _stddev_exact("x").alias("def_x_std"),
        F.avg("y").alias("def_y_mean"),
        _stddev_exact("y").alias("def_y_std"),
        F.avg("s").alias("def_s_mean"),
        _stddev_exact("s").alias("def_s_std"),
        F.countDistinct("nflId").alias("n_defenders"),
    )
    feats = agg.join(
        plays.select(
            "gameId", "playId", "down", "yardsToGo",
            "absoluteYardlineNumber",
            (F.col("preSnapHomeScore") - F.col("preSnapVisitorScore")).alias(
                "score_diff"
            ),
            "pff_passCoverage",
        ),
        ["gameId", "playId"],
    ).filter(F.col("pff_passCoverage").isNotNull())
    return feats.na.fill(0)


COVERAGE_FEATURE_COLS = [
    "def_x_mean", "def_x_std", "def_y_mean", "def_y_std",
    "def_s_mean", "def_s_std", "n_defenders",
    "down", "yardsToGo", "absoluteYardlineNumber", "score_diff",
]


def assignment_features(
    tracking: DataFrame, plays: DataFrame, player_play: DataFrame
) -> DataFrame:
    """Per-defender features (`DefPosModel.ipynb` cell 1): start/end
    positions (A6 min_by/max_by — the notebook's per-group Python loop
    eliminated) + motion aggregates; label =
    pff_defensiveCoverageAssignment."""
    defenders = tracking.join(
        F.broadcast(plays.select("gameId", "playId", "defensiveTeam")),
        ["gameId", "playId"],
    ).filter(
        (F.col("club") == F.col("defensiveTeam")) & F.col("nflId").isNotNull()
    )
    agg = defenders.groupBy("gameId", "playId", "nflId").agg(
        F.min_by("x", "frameId").alias("start_x"),
        F.max_by("x", "frameId").alias("end_x"),
        F.min_by("y", "frameId").alias("start_y"),
        F.max_by("y", "frameId").alias("end_y"),
        F.avg("s").alias("s_mean"),
        F.max("s").alias("s_max"),
        F.avg("a").alias("a_mean"),
    )
    labels = player_play.select(
        "gameId", "playId", "nflId", "pff_defensiveCoverageAssignment"
    ).filter(F.col("pff_defensiveCoverageAssignment").isNotNull())
    return agg.join(labels, ["gameId", "playId", "nflId"]).na.fill(0)


ASSIGNMENT_FEATURE_COLS = [
    "start_x", "end_x", "start_y", "end_y", "s_mean", "s_max", "a_mean",
]


def classifier_pipeline(
    label_col: str,
    feature_cols: list[str],
    n_trees: int = 100,
    max_depth: int = 10,
    scale: bool = False,
    model: str = "rf",
) -> Pipeline:
    """StringIndexer (X4) → VectorAssembler [→ StandardScaler (X7)] →
    classifier (X6), seed-pinned. `model` picks the family: 'rf'
    (RandomForest, the notebooks' winner), 'logreg' (multinomial
    LogisticRegression), 'gbt_ovr' (gradient-boosted trees lifted to
    multiclass via OneVsRest)."""
    stages = [
        StringIndexer(
            inputCol=label_col, outputCol="label", handleInvalid="skip"
        ),
        VectorAssembler(inputCols=feature_cols, outputCol="raw_features"),
    ]
    feat = "raw_features"
    if scale:
        stages.append(
            StandardScaler(inputCol=feat, outputCol="features", withMean=True)
        )
        feat = "features"
    if model == "rf":
        clf = RandomForestClassifier(
            featuresCol=feat,
            labelCol="label",
            numTrees=n_trees,
            maxDepth=max_depth,
            seed=SEED,
        )
    elif model == "logreg":
        clf = LogisticRegression(
            featuresCol=feat, labelCol="label", maxIter=50, regParam=0.01
        )
    elif model == "gbt_ovr":
        clf = OneVsRest(
            classifier=GBTClassifier(
                featuresCol=feat,
                labelCol="label",
                maxIter=max(10, n_trees // 5),
                maxDepth=min(max_depth, 5),
                seed=SEED,
            ),
            featuresCol=feat,
            labelCol="label",
            parallelism=4,
        )
    elif model in ("mlp", "gbdt", "lgbm", "catb"):
        raise ValueError(
            f"the {model!r} family is not an MLlib pipeline — use "
            "NumpyMLPClassifier / NumpyGBDTClassifier / "
            "NumpyLGBMClassifier / NumpyCatBoostClassifier "
            "(train_eval/compare_models route them automatically)"
        )
    else:
        raise ValueError(f"unknown model family {model!r}; use {MODEL_FAMILIES}")
    stages.append(clf)
    return Pipeline(stages=stages)


def hash_split(
    df: DataFrame,
    key_cols: list[str],
    test_pct: int = 20,
    salt: str = "split:v1",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic hash-based train/test split: a row lands in test
    iff `portable_hash64(salt + key) % 100 < test_pct`.

    The production alternative to `randomSplit` (X5): membership is a
    pure function of the row's KEY, so it is stable when the dataset
    grows (old rows never flip sides — no train/test leakage across
    retraining runs), identical on any engine (md5-derived hash, so an
    external system can reproduce the split), and partition-order-free
    by construction. `salt` versions the split without touching keys.
    Filters stay in codegen; no shuffle, no RNG state.

    Keys must be non-null: `concat_ws` skips NULL args inside
    `tagged_hash64`, so a NULL key byte-collides with the key that
    simply omits it — two distinct rows would be forced onto the same
    side forever. Guarded per row (round-10 audit, the sampling
    discipline)."""
    from .operators.sampling import _require_nonnull_key
    from .operators.text import tagged_hash64

    for c in key_cols:
        df = _require_nonnull_key(df, c, "hash_split")
    bucket = tagged_hash64(salt, *[F.col(c) for c in key_cols]) % 100
    return df.filter(bucket >= test_pct), df.filter(bucket < test_pct)


def cluster_safe_split(
    df: DataFrame,
    id_col: str,
    components: DataFrame,
    test_pct: int = 20,
    salt: str = "split:v1",
    broadcast_components: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Leakage-proof train/test split: near-duplicate documents MUST
    land on the same side, or test metrics silently measure
    memorization of train-set twins (the published eval-contamination
    failure `hash_split` alone cannot prevent — it hashes each row's
    own key, so two near-dups split independently).

    `components` is the (node, component) relation from the near-dup
    funnel (`connected_components` over verified pairs, the q74/q75
    path). The split key is ``coalesce(component, id)`` — every member
    of a cluster hashes the CLUSTER id, unclustered docs hash their
    own — then the same deterministic md5 bucket rule as `hash_split`
    (growth-stable, engine-portable, salt-versioned).

    Scale: the components relation is bounded by near-dup volume
    (≪ corpus); broadcast by default so the corpus never shuffles —
    pass ``broadcast_components=False`` to fall back to a hash join
    keyed on the id when the dup graph is too big to broadcast. The
    membership filter itself is pure codegen."""
    from .operators.text import tagged_hash64

    comp = components.select(
        F.col("node"), F.col("component").alias("__comp")
    )
    if broadcast_components:
        comp = F.broadcast(comp)
    joined = df.join(comp, df[id_col] == comp["node"], "left").drop("node")
    key = F.coalesce(F.col("__comp"), F.col(id_col)).cast("string")
    bucket = tagged_hash64(salt, key) % 100
    train = joined.filter(bucket >= test_pct).drop("__comp")
    test = joined.filter(bucket < test_pct).drop("__comp")
    return train, test


def train_eval(
    features: DataFrame,
    label_col: str,
    feature_cols: list[str],
    **kwargs,
) -> tuple[PipelineModel, DataFrame, dict[str, float]]:
    """X5 seed-42 80/20 split, fit, X8 metrics (accuracy + logloss)."""
    train, test = features.randomSplit([0.8, 0.2], seed=SEED)
    if kwargs.get("model") in ("mlp", "gbdt", "lgbm", "catb"):
        cls = {
            "mlp": NumpyMLPClassifier,
            "gbdt": NumpyGBDTClassifier,
            "lgbm": NumpyLGBMClassifier,
            "catb": NumpyCatBoostClassifier,
        }[kwargs["model"]]
        kw = {"seed": SEED} if kwargs["model"] == "mlp" else {}
        m = cls(label_col, feature_cols, **kw)
        m.fit(train)
        pred = m.transform(test)
        return m, pred, m.evaluate(pred)
    model = classifier_pipeline(label_col, feature_cols, **kwargs).fit(train)
    pred = model.transform(test)
    acc = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    ).evaluate(pred)
    metrics = {"accuracy": acc}
    if "probability" in pred.columns:  # OneVsRest emits prediction only
        metrics["log_loss"] = MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction", metricName="logLoss"
        ).evaluate(pred)
    return model, pred, metrics


def compare_models(
    features: DataFrame,
    label_col: str,
    feature_cols: list[str],
    models: tuple[str, ...] = MODEL_FAMILIES,
    **kwargs,
) -> dict[str, dict[str, float]]:
    """The reference's model-comparison table (`DefPosModel.ipynb`
    cell 16, `DefCoverage.ipynb` cell 6): train every available family
    on the same seed-42 split, report per-family metrics. Returns
    {family: {metric: value}}."""
    return {
        m: train_eval(features, label_col, feature_cols, model=m, **kwargs)[2]
        for m in models
    }


def tune(
    features: DataFrame,
    label_col: str,
    feature_cols: list[str],
    n_trees_grid: list[int] = (50, 100),
    max_depth_grid: list[int] = (5, 10),
    folds: int = 2,
) -> tuple[PipelineModel, dict[str, float]]:
    """X6's hyperparameter search (`DefPosModel.ipynb` cell 3,
    RandomizedSearchCV — commented out in the reference) as a
    seed-pinned CrossValidator grid. Fitting parallelism comes from
    Spark tasks; each fold's fit is distributed, so the search scales
    with the cluster rather than a joblib pool."""
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    pipe = classifier_pipeline(label_col, feature_cols)
    rf = pipe.getStages()[-1]
    grid = (
        ParamGridBuilder()
        .addGrid(rf.numTrees, list(n_trees_grid))
        .addGrid(rf.maxDepth, list(max_depth_grid))
        .build()
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction", metricName="accuracy"
        ),
        numFolds=folds,
        seed=SEED,
        parallelism=2,
    )
    model = cv.fit(features)
    best = model.bestModel
    best_rf = best.stages[-1]
    return best, {
        "best_num_trees": float(best_rf.getNumTrees),
        "best_max_depth": float(best_rf.getMaxDepth()),
        "best_avg_accuracy": float(max(model.avgMetrics)),
    }


def tune_random(
    features: DataFrame,
    label_col: str,
    feature_cols: list[str],
    n_iter: int = 6,
    space: dict[str, tuple[int, int]] | None = None,
    folds: int = 2,
    seed: int = SEED,
) -> tuple[PipelineModel, dict[str, float]]:
    """X6's RANDOMIZED hyperparameter search — the literal analogue of
    the `RandomizedSearchCV` the reference drafts (commented out) in
    `DefCoverage.ipynb` cell 3, beside the grid `tune`: sample
    `n_iter` seed-pinned configurations WITHOUT replacement from
    integer ranges (`space`: param → (lo, hi) inclusive; defaults
    mirror the grid's numTrees/maxDepth axes) and evaluate each with
    the same CrossValidator machinery. Randomized search beats the
    grid when the budget is small relative to the space (Bergstra &
    Bengio 2012) — n_iter trials cover n_iter distinct values per
    axis where a grid covers √n_iter.

    Deterministic: the sample is a pure function of `seed`
    (random.Random, not numpy — no global state), and CrossValidator
    folds are seed-pinned, so re-running reproduces the same table.
    Fold fits are distributed Spark jobs (parallelism=2), scaling
    with the cluster like `tune`."""
    import random as _random

    from pyspark.ml.tuning import CrossValidator

    space = space or {"numTrees": (20, 150), "maxDepth": (3, 12)}
    pipe = classifier_pipeline(label_col, feature_cols)
    rf = pipe.getStages()[-1]
    params = {"numTrees": rf.numTrees, "maxDepth": rf.maxDepth}
    unknown = set(space) - set(params)
    if unknown:
        raise ValueError(f"tune_random: unknown params {sorted(unknown)}")
    total = 1
    for lo, hi in space.values():
        total *= hi - lo + 1
    if n_iter > total:
        raise ValueError(
            f"tune_random: n_iter={n_iter} exceeds the {total} distinct "
            "configurations in the space"
        )
    rng = _random.Random(seed)
    seen: set[tuple[int, ...]] = set()
    maps = []
    while len(maps) < n_iter:
        cfg = tuple(
            rng.randint(*space[name]) for name in sorted(space)
        )
        if cfg in seen:
            continue
        seen.add(cfg)
        maps.append(
            {
                params[name]: v
                for name, v in zip(sorted(space), cfg)
            }
        )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=maps,
        evaluator=MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction",
            metricName="accuracy",
        ),
        numFolds=folds,
        seed=seed,
        parallelism=2,
    )
    model = cv.fit(features)
    best_rf = model.bestModel.stages[-1]
    return model.bestModel, {
        "best_num_trees": float(best_rf.getNumTrees),
        "best_max_depth": float(best_rf.getMaxDepth()),
        "best_avg_accuracy": float(max(model.avgMetrics)),
        "n_candidates": float(len(maps)),
    }


def confusion_matrix(pred: DataFrame) -> DataFrame:
    """X8: confusion matrix as a pivot (`DefCoverage.ipynb` cell 7)."""
    return (
        pred.groupBy("label")
        .pivot("prediction")
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


def classification_report(
    pred: DataFrame,
    label_col: str = "label",
    pred_col: str = "prediction",
) -> DataFrame:
    """X8 widening (round 11): per-class precision / recall / F1 /
    support — sklearn's `classification_report` table as a DataFrame
    (the reference prints accuracy/log-loss/confusion; per-class rates
    are the standard next question every model comparison asks).

    One cells aggregate + two tiny rollups + one |classes|-sized join:
    precision(c) = TP(c)/Σ_pred=c, recall(c) = TP(c)/support(c),
    F1 = 2PR/(P+R). All ratios are single IEEE divisions of exact
    integer counts — correctly rounded, so Spark and an oracle SQL
    agree bit-for-bit with no rounding step (the A4
    ratio-of-aggregates discipline). Undefined rates are NULL, not
    sklearn's zero_division=0: a class never PREDICTED has NULL
    precision and F1 (honest "undefined", distinguishable from a true
    zero); rows are one per observed LABEL class (a value appearing
    only in predictions contributes to other classes' precision
    denominators but gets no row — it has no recall to report).

    Scale: the cells table is |classes|² after one map-side-combined
    groupBy over the scored rows; everything after is classes-sized."""
    cells = pred.groupBy(label_col, pred_col).agg(
        F.count("*").alias("__n")
    )
    by_label = cells.groupBy(label_col).agg(
        F.sum("__n").alias("support"),
        F.sum(
            F.when(
                F.col(pred_col) == F.col(label_col), F.col("__n")
            ).otherwise(F.lit(0))
        ).alias("__tp"),
    )
    by_pred = cells.groupBy(F.col(pred_col).alias(label_col)).agg(
        F.sum("__n").alias("__pred_n")
    )
    p = F.col("__tp").cast("double") / F.col("__pred_n")
    r = F.col("__tp").cast("double") / F.col("support")
    rep = (
        by_label.join(F.broadcast(by_pred), label_col, "left")
        .withColumn("precision", p)
        .withColumn("recall", r)
        .withColumn(
            "f1",
            F.when(
                F.col("precision") + F.col("recall") > 0,
                F.lit(2.0) * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ),
        )
    )
    return rep.select(label_col, "precision", "recall", "f1", "support")


class RuleCoverageModel:
    """A deterministic rule 'model' with the MLlib Transformer calling
    convention: `transform` appends a `probabilities` map column
    (class → prob) from a single feature threshold. Not learned — it
    exists so the X9 inference PATH (`predict_for_play`: filter-first
    per-play scoring returning class→prob maps, `DefPosModel.ipynb`
    cell 7's contract) can run under the driver's value-hash oracle
    (q92 'x9' columns), where an iterative fitted model could only get
    a tolerance band. Real fitted-model scoring through the same
    `predict_for_play` stays pytest-side (tests/test_ml.py)."""

    def __init__(
        self,
        feature: str = "def_s_mean",
        threshold: float = 5.0,
        classes: tuple[str, str] = ("Cover-1", "other"),
        p_hit: float = 0.75,
    ) -> None:
        self.feature = feature
        self.threshold = threshold
        self.classes = classes
        self.p_hit = p_hit

    def transform(self, df: DataFrame) -> DataFrame:
        p1 = (
            F.when(F.col(self.feature) > self.threshold, F.lit(self.p_hit))
            .otherwise(F.lit(1.0 - self.p_hit))
            .cast("double")
        )
        return df.withColumn(
            "probabilities",
            F.create_map(
                F.lit(self.classes[0]), p1,
                F.lit(self.classes[1]), F.lit(1.0) - p1,
            ),
        )




class NumpyMLPClassifier:
    """The reference's Keras MLP (`DefPosModel.ipynb` cell 10:
    Dense→Dense→softmax over StandardScaler'd features, Adam) as the
    FOURTH model family — re-expressed in pure NumPy because the env
    ships no TensorFlow/sklearn (the one X6 gap): a two-layer softmax
    MLP is ~40 lines of matmuls and needs neither.

    Division of labor at 100 TB: feature ASSEMBLY is the distributed
    Spark job (`coverage_features` etc.); this model class trains on
    the AGGREGATED per-play table — thousands of rows by construction,
    the same driver-sized frame the reference feeds Keras — collected
    once. Deterministic end to end, unlike the reference's run-to-run
    Keras drift: seeded He init, full-batch Adam (no minibatch order),
    no dropout, fixed epoch count — refitting yields bit-identical
    weights, so tests pin exact behavior instead of tolerance bands.
    INFERENCE is distributed: `transform` closes the small weight
    matrices over `mapInPandas` and scores each Arrow batch with two
    matmuls — never row-at-a-time Python.
    """

    def __init__(
        self,
        label_col: str,
        feature_cols: list[str],
        hidden: tuple[int, ...] = (64, 32),
        epochs: int = 300,
        lr: float = 0.01,
        l2: float = 1e-4,
        seed: int = SEED,
        max_fit_rows: int = 1_000_000,
    ) -> None:
        self.label_col = label_col
        self.feature_cols = list(feature_cols)
        self.hidden = tuple(hidden)
        self.epochs = epochs
        self.lr = lr
        self.l2 = l2
        self.seed = seed
        self.max_fit_rows = max_fit_rows

    # -- numpy core -----------------------------------------------------
    @staticmethod
    def _softmax(z):
        import numpy as np

        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=1, keepdims=True)

    def _forward(self, X):
        import numpy as np

        acts = [X]
        for W, b in self.layers_[:-1]:
            acts.append(np.maximum(acts[-1] @ W + b, 0.0))
        W, b = self.layers_[-1]
        return acts, self._softmax(acts[-1] @ W + b)

    def fit(self, df: DataFrame) -> "NumpyMLPClassifier":
        import numpy as np

        pdf, feats = _fit_frame(
            df, "NumpyMLPClassifier", self.label_col,
            self.feature_cols, self.max_fit_rows,
        )
        self.classes_ = sorted(pdf[self.label_col].astype(str).unique())
        idx = {c: i for i, c in enumerate(self.classes_)}
        y = pdf[self.label_col].astype(str).map(idx).to_numpy()
        X = feats
        # StandardScaler half of the reference pipeline, folded in
        self.mu_ = X.mean(axis=0)
        sd = X.std(axis=0)
        self.sd_ = np.where(sd == 0, 1.0, sd)
        X = (X - self.mu_) / self.sd_
        n, k = len(X), len(self.classes_)
        onehot = np.zeros((n, k))
        onehot[np.arange(n), y] = 1.0

        rng = np.random.default_rng(self.seed)
        dims = [X.shape[1], *self.hidden, k]
        self.layers_ = [
            (
                rng.normal(0.0, np.sqrt(2.0 / dims[i]), (dims[i], dims[i + 1])),
                np.zeros(dims[i + 1]),
            )
            for i in range(len(dims) - 1)
        ]
        # full-batch Adam — deterministic, no shuffling state
        ms = [(np.zeros_like(W), np.zeros_like(b)) for W, b in self.layers_]
        vs = [(np.zeros_like(W), np.zeros_like(b)) for W, b in self.layers_]
        b1, b2, eps = 0.9, 0.999, 1e-8
        for t in range(1, self.epochs + 1):
            acts, probs = self._forward(X)
            delta = (probs - onehot) / n
            grads = []
            for li in range(len(self.layers_) - 1, -1, -1):
                W, _ = self.layers_[li]
                gW = acts[li].T @ delta + self.l2 * W
                gb = delta.sum(axis=0)
                grads.append((gW, gb))
                if li:
                    delta = (delta @ W.T) * (acts[li] > 0)
            grads.reverse()
            new_layers = []
            for li, ((W, b), (gW, gb)) in enumerate(
                zip(self.layers_, grads)
            ):
                mW, mb = ms[li]
                vW, vb = vs[li]
                mW = b1 * mW + (1 - b1) * gW
                mb = b1 * mb + (1 - b1) * gb
                vW = b2 * vW + (1 - b2) * gW * gW
                vb = b2 * vb + (1 - b2) * gb * gb
                ms[li], vs[li] = (mW, mb), (vW, vb)
                cW = mW / (1 - b1**t) / (np.sqrt(vW / (1 - b2**t)) + eps)
                cb = mb / (1 - b1**t) / (np.sqrt(vb / (1 - b2**t)) + eps)
                new_layers.append((W - self.lr * cW, b - self.lr * cb))
            self.layers_ = new_layers
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        """Appends `prediction` (class index into the sorted classes_),
        `predicted_label`, and `probabilities` (class → prob map) —
        distributed Arrow-batched scoring."""
        import pandas as pd

        from pyspark.sql.types import (
            DoubleType,
            MapType,
            StringType,
            StructField,
            StructType,
        )

        feature_cols = self.feature_cols
        classes = self.classes_
        mu, sd, layers = self.mu_, self.sd_, self.layers_
        softmax = self._softmax
        schema = StructType(
            list(df.schema.fields)
            + [
                StructField("prediction", DoubleType()),
                StructField("predicted_label", StringType()),
                StructField(
                    "probabilities", MapType(StringType(), DoubleType())
                ),
            ]
        )

        def score(it):
            import numpy as np

            for pdf in it:
                X = pdf[feature_cols].to_numpy(dtype=np.float64)
                X = (X - mu) / sd
                a = X
                for W, b in layers[:-1]:
                    a = np.maximum(a @ W + b, 0.0)
                W, b = layers[-1]
                probs = softmax(a @ W + b)
                pdf = pdf.copy()
                pdf["prediction"] = probs.argmax(axis=1).astype("float64")
                pdf["predicted_label"] = [
                    classes[i] for i in probs.argmax(axis=1)
                ]
                pdf["probabilities"] = [
                    dict(zip(classes, map(float, row))) for row in probs
                ]
                yield pdf

        return df.mapInPandas(score, schema=schema)

    def evaluate(self, pred: DataFrame) -> dict[str, float]:
        """X8 metrics on a transformed frame: accuracy + multiclass
        log loss (clamped like sklearn's log_loss eps)."""
        p_true = F.element_at(
            F.col("probabilities"), F.col(self.label_col).cast("string")
        )
        row = pred.agg(
            F.avg(
                (
                    F.col("predicted_label")
                    == F.col(self.label_col).cast("string")
                ).cast("double")
            ).alias("acc"),
            F.avg(
                -F.log(F.greatest(F.coalesce(p_true, F.lit(0.0)), F.lit(1e-15)))
            ).alias("ll"),
        ).collect()[0]
        return {"accuracy": float(row.acc), "log_loss": float(row.ll)}



class NumpyGBDTClassifier:
    """The reference's boosted-tree families (`DefPosModel.ipynb`
    cell 16: XGBoost / LightGBM / CatBoost) as the FIFTH model family,
    re-expressed in pure NumPy — the env ships none of the three, and
    MLlib's GBTClassifier is binary-only (the 'gbt_ovr' OneVsRest lift
    loses calibrated multiclass probabilities). This is the actual
    XGBoost algorithm, not an approximation: multiclass softprob
    boosting with second-order (Newton) leaf weights
    w = −G/(H+λ) and split gain ½[G_L²/(H_L+λ) + G_R²/(H_R+λ)
    − G²/(H+λ)] − γ, greedy exact split search.

    Division of labor at 100 TB mirrors `NumpyMLPClassifier`: feature
    ASSEMBLY is the distributed Spark job; the boosted fit runs on the
    collected driver-sized per-play table (the same frame the
    reference feeds xgboost.fit); INFERENCE is distributed — the tree
    ensemble is a few KB of flat arrays closed over `mapInPandas`,
    each Arrow batch scored by vectorized level-wise traversal, never
    row-at-a-time Python.

    Deterministic BY CONSTRUCTION, unlike xgboost's hist-builder
    thread races: no RNG anywhere (no row/column subsampling), splits
    only between strictly distinct feature values (so within-run float
    cumsum order cannot move a boundary), ties broken lowest-feature /
    lowest-threshold first — refitting on the same collected frame
    yields bit-identical trees, so tests pin exact probabilities
    instead of tolerance bands."""

    def __init__(
        self,
        label_col: str,
        feature_cols: list[str],
        n_rounds: int = 40,
        max_depth: int = 3,
        learning_rate: float = 0.3,
        reg_lambda: float = 1.0,
        gamma: float = 0.0,
        min_child_weight: float = 1.0,
        max_fit_rows: int = 1_000_000,
    ) -> None:
        self.label_col = label_col
        self.feature_cols = list(feature_cols)
        self.n_rounds = n_rounds
        self.max_depth = max_depth
        self.learning_rate = learning_rate
        self.reg_lambda = reg_lambda
        self.gamma = gamma
        self.min_child_weight = min_child_weight
        self.max_fit_rows = max_fit_rows

    # -- numpy core -----------------------------------------------------
    def _build_tree(self, X, g, h, idx, depth):
        """Greedy exact split search → flat-array tree
        (feature, thresh, left, right, value); feature −1 marks a
        leaf. Returns node index within self._nodes."""
        import numpy as np

        lam = self.reg_lambda
        G, H = float(g[idx].sum()), float(h[idx].sum())
        node = len(self._nodes)
        self._nodes.append([-1, 0.0, -1, -1, -G / (H + lam)])
        if depth >= self.max_depth or len(idx) < 2:
            return node
        base = G * G / (H + lam)
        best_gain, best_j, best_pos = 0.0, -1, -1
        best_order = None
        for j in range(X.shape[1]):
            v = X[idx, j]
            order = np.argsort(v, kind="stable")
            vs = v[order]
            # split only BETWEEN strictly distinct values: the cumsum
            # at a run boundary is the full prefix sum regardless of
            # within-run row order → layout-independent boundaries
            valid = vs[:-1] < vs[1:]
            if not valid.any():
                continue
            cg = np.cumsum(g[idx][order])[:-1]
            ch = np.cumsum(h[idx][order])[:-1]
            ok = (
                valid
                & (ch >= self.min_child_weight)
                & (H - ch >= self.min_child_weight)
            )
            if not ok.any():
                continue
            gain = np.where(
                ok,
                0.5
                * (
                    cg * cg / (ch + lam)
                    + (G - cg) * (G - cg) / (H - ch + lam)
                    - base
                )
                - self.gamma,
                -np.inf,
            )
            pos = int(np.argmax(gain))  # first max → lowest threshold
            # strict > keeps the LOWEST feature index on gain ties
            if gain[pos] > best_gain:
                best_gain = float(gain[pos])
                best_j, best_pos, best_order = j, pos, order
        if best_j < 0:
            return node
        v = X[idx, best_j][best_order]
        thr = (float(v[best_pos]) + float(v[best_pos + 1])) / 2.0
        left_idx = idx[best_order[: best_pos + 1]]
        right_idx = idx[best_order[best_pos + 1 :]]
        self._nodes[node][0] = best_j
        self._nodes[node][1] = thr
        self._nodes[node][2] = self._build_tree(
            X, g, h, left_idx, depth + 1
        )
        self._nodes[node][3] = self._build_tree(
            X, g, h, right_idx, depth + 1
        )
        return node

    @staticmethod
    def _predict_tree(tree, X):
        """Vectorized level-wise traversal of one flat-array tree."""
        import numpy as np

        feat, thr, left, right, val = tree
        node = np.zeros(len(X), dtype=np.int64)
        for _ in range(64):  # depth-bounded; leaves are absorbing
            f = feat[node]
            at_leaf = f < 0
            if at_leaf.all():
                break
            go_left = X[np.arange(len(X)), np.maximum(f, 0)] <= thr[node]
            nxt = np.where(go_left, left[node], right[node])
            node = np.where(at_leaf, node, nxt)
        return val[node]

    def _raw_scores(self, X):
        import numpy as np

        out = np.zeros((len(X), len(self.classes_)))
        for round_trees in self.trees_:
            for c, tree in enumerate(round_trees):
                out[:, c] += self.learning_rate * self._predict_tree(
                    tree, X
                )
        return out

    def _matrix(self, pdf):
        """Scoring-time feature matrix from an Arrow batch — the hook
        `NumpyCatBoostClassifier` overrides to append its
        target-statistic encodings after the numeric columns."""
        import numpy as np

        return pdf[self.feature_cols].to_numpy(dtype=np.float64)

    def fit(self, df: DataFrame) -> "NumpyGBDTClassifier":
        import numpy as np

        pdf, X = _fit_frame(
            df, type(self).__name__, self.label_col,
            self.feature_cols, self.max_fit_rows,
        )
        self.classes_ = sorted(pdf[self.label_col].astype(str).unique())
        idx = {c: i for i, c in enumerate(self.classes_)}
        y = pdf[self.label_col].astype(str).map(idx).to_numpy()
        n, k = len(X), len(self.classes_)
        onehot = np.zeros((n, k))
        onehot[np.arange(n), y] = 1.0

        scores = np.zeros((n, k))
        self.trees_ = []
        all_rows = np.arange(n)
        for _ in range(self.n_rounds):
            z = scores - scores.max(axis=1, keepdims=True)
            e = np.exp(z)
            p = e / e.sum(axis=1, keepdims=True)
            grad = p - onehot          # softprob first order
            hess = p * (1.0 - p)       # diagonal second order
            round_trees = []
            for c in range(k):
                self._nodes = []
                self._build_tree(X, grad[:, c], hess[:, c], all_rows, 0)
                tree = tuple(
                    np.array(col)
                    for col in zip(*self._nodes)
                )
                del self._nodes
                round_trees.append(tree)
                scores[:, c] += self.learning_rate * self._predict_tree(
                    tree, X
                )
            self.trees_.append(round_trees)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        """Appends `prediction` / `predicted_label` / `probabilities`
        — the `NumpyMLPClassifier.transform` contract, scored by
        distributed Arrow-batched ensemble traversal."""
        from pyspark.sql.types import (
            DoubleType,
            MapType,
            StringType,
            StructField,
            StructType,
        )

        classes = self.classes_
        raw_scores = self._raw_scores
        matrix = self._matrix
        schema = StructType(
            list(df.schema.fields)
            + [
                StructField("prediction", DoubleType()),
                StructField("predicted_label", StringType()),
                StructField(
                    "probabilities", MapType(StringType(), DoubleType())
                ),
            ]
        )

        def score(it):
            import numpy as np

            for pdf in it:
                X = matrix(pdf)
                z = raw_scores(X)
                z = z - z.max(axis=1, keepdims=True)
                e = np.exp(z)
                probs = e / e.sum(axis=1, keepdims=True)
                pdf = pdf.copy()
                pdf["prediction"] = probs.argmax(axis=1).astype(
                    "float64"
                )
                pdf["predicted_label"] = [
                    classes[i] for i in probs.argmax(axis=1)
                ]
                pdf["probabilities"] = [
                    dict(zip(classes, map(float, row))) for row in probs
                ]
                yield pdf

        return df.mapInPandas(score, schema=schema)

    # identical metric contract — accuracy + clamped multiclass
    # log loss over the (predicted_label, probabilities) columns
    evaluate = NumpyMLPClassifier.evaluate


class NumpyLGBMClassifier(NumpyGBDTClassifier):
    """The reference's LightGBM family (`DefPosModel.ipynb` cell 16's
    best-accuracy tree library after CatBoost) as the SIXTH model
    family — the actual LightGBM growth algorithm (Ke et al., NeurIPS
    2017), not a re-badged XGBoost:

    - HISTOGRAM split finding: each feature is bucketed once per fit
      into ≤`max_bin` bins (boundaries = midpoints of sorted distinct
      training values, evenly thinned past the cap); split search
      scans per-bin gradient/hessian sums via bincount instead of
      sorting rows — O(n + bins) per feature per leaf.
    - LEAF-WISE (best-first) growth under a `num_leaves` budget: each
      step splits the ONE leaf with the largest gain anywhere in the
      tree, so deep chases down an informative branch are possible
      where the parent's depth-wise growth would spend the same
      budget evenly across a level.

    The objective is the parent's second-order multiclass softprob
    (LightGBM and XGBoost share the math — Newton leaf weights
    −G/(H+λ), the same split gain); only binning + growth policy
    differ, which is exactly the LightGBM-vs-XGBoost delta. No GOSS /
    EFB (they are RNG subsampling and sparse-feature bundling — both
    counterproductive on driver-sized dense frames and both would
    break refit determinism); no sibling-histogram subtraction (a
    constant-factor trick, pointless at this n).

    Deterministic by construction under the parent's discipline: no
    RNG, ties break lowest-node → lowest-feature → lowest-bin, so
    refits are bit-identical and tests pin exact trees. Trees land in
    the parent's flat-array layout with RAW-VALUE thresholds (bin
    boundaries), so `transform` / `_predict_tree` / `evaluate` are
    inherited unchanged — scoring needs no binning and stays
    Arrow-batched and distributed."""

    def __init__(
        self,
        label_col: str,
        feature_cols: list[str],
        n_rounds: int = 40,
        num_leaves: int = 8,
        learning_rate: float = 0.3,
        reg_lambda: float = 1.0,
        min_child_weight: float = 1e-3,
        min_data_in_leaf: int = 1,
        max_bin: int = 255,
        max_fit_rows: int = 1_000_000,
    ) -> None:
        if not 2 <= num_leaves <= 64:
            # _predict_tree's traversal is bounded at 64 levels; a
            # leaf-wise tree can be a chain of depth num_leaves − 1
            raise ValueError("num_leaves must be in [2, 64]")
        if max_bin < 2:
            raise ValueError("max_bin must be >= 2")
        self.label_col = label_col
        self.feature_cols = list(feature_cols)
        self.n_rounds = n_rounds
        self.num_leaves = num_leaves
        self.learning_rate = learning_rate
        self.reg_lambda = reg_lambda
        self.min_child_weight = min_child_weight
        self.min_data_in_leaf = min_data_in_leaf
        self.max_bin = max_bin
        self.max_fit_rows = max_fit_rows

    # -- numpy core -----------------------------------------------------
    def _bin_features(self, X):
        """Per-feature bin boundaries (midpoints of sorted distinct
        values, evenly thinned to max_bin − 1) + the binned int matrix.
        bin(v) = #{boundaries < v}, so `bin ≤ t  ⇔  v ≤ bounds[t]` —
        raw-value thresholds at predict time reproduce the training
        binning exactly."""
        import numpy as np

        bounds_all = []
        B = np.zeros(X.shape, dtype=np.int64)
        for j in range(X.shape[1]):
            d = np.unique(X[:, j])  # sorted distinct
            bounds = (d[:-1] + d[1:]) / 2.0
            if len(bounds) > self.max_bin - 1:
                sel = np.unique(
                    np.round(
                        np.linspace(0, len(bounds) - 1, self.max_bin - 1)
                    ).astype(np.int64)
                )
                bounds = bounds[sel]
            bounds_all.append(bounds)
            B[:, j] = np.searchsorted(bounds, X[:, j], side="left")
        return bounds_all, B

    def _leaf_best_split(self, B, bounds_all, g, h, idx, G, H):
        """Best (gain, feature, bin) for one leaf from per-bin
        histogram sums. First argmax → lowest bin on gain ties;
        strict > across features → lowest feature index."""
        import numpy as np

        lam = self.reg_lambda
        base = G * G / (H + lam)
        best_gain, best_j, best_pos = 0.0, -1, -1
        n_leaf = len(idx)
        for j in range(B.shape[1]):
            nb = len(bounds_all[j]) + 1
            if nb < 2:
                continue
            b = B[idx, j]
            bg = np.bincount(b, weights=g[idx], minlength=nb)
            bh = np.bincount(b, weights=h[idx], minlength=nb)
            bc = np.bincount(b, minlength=nb)
            cg = np.cumsum(bg)[:-1]
            ch = np.cumsum(bh)[:-1]
            cc = np.cumsum(bc)[:-1]
            ok = (
                (ch >= self.min_child_weight)
                & (H - ch >= self.min_child_weight)
                & (cc >= self.min_data_in_leaf)
                & (n_leaf - cc >= self.min_data_in_leaf)
            )
            if not ok.any():
                continue
            gain = np.where(
                ok,
                0.5
                * (
                    cg * cg / (ch + lam)
                    + (G - cg) * (G - cg) / (H - ch + lam)
                    - base
                ),
                -np.inf,
            )
            pos = int(np.argmax(gain))
            if gain[pos] > best_gain:
                best_gain = float(gain[pos])
                best_j, best_pos = j, pos
        return best_gain, best_j, best_pos

    def _grow_tree(self, B, bounds_all, g, h):
        """Leaf-wise growth to num_leaves (or until no positive gain).
        Nodes share the parent's flat layout
        (feature, thr, left, right, value), feature −1 = leaf."""
        import numpy as np

        lam = self.reg_lambda
        nodes: list[list] = []

        def mk_leaf(idx):
            G, H = float(g[idx].sum()), float(h[idx].sum())
            nodes.append([-1, 0.0, -1, -1, -G / (H + lam)])
            return len(nodes) - 1, G, H

        all_idx = np.arange(len(g))
        root, G, H = mk_leaf(all_idx)
        leaves = {root: (all_idx, G, H)}
        cand = {
            root: self._leaf_best_split(B, bounds_all, g, h, all_idx, G, H)
        }
        n_leaves = 1
        while n_leaves < self.num_leaves:
            # split the single best leaf anywhere in the tree;
            # gain ties → the earliest-created node
            nid = max(cand, key=lambda i: (cand[i][0], -i))
            gain, j, pos = cand[nid]
            if gain <= 0.0 or j < 0:
                break
            idx, _, _ = leaves.pop(nid)
            del cand[nid]
            go_left = B[idx, j] <= pos
            li, ri = idx[go_left], idx[~go_left]
            lnode, GL, HL = mk_leaf(li)
            rnode, GR, HR = mk_leaf(ri)
            nodes[nid][0] = j
            nodes[nid][1] = float(bounds_all[j][pos])
            nodes[nid][2] = lnode
            nodes[nid][3] = rnode
            leaves[lnode] = (li, GL, HL)
            cand[lnode] = self._leaf_best_split(
                B, bounds_all, g, h, li, GL, HL
            )
            leaves[rnode] = (ri, GR, HR)
            cand[rnode] = self._leaf_best_split(
                B, bounds_all, g, h, ri, GR, HR
            )
            n_leaves += 1
        return tuple(np.array(col) for col in zip(*nodes))

    def fit(self, df: DataFrame) -> "NumpyLGBMClassifier":
        import numpy as np

        pdf, X = _fit_frame(
            df, "NumpyLGBMClassifier", self.label_col,
            self.feature_cols, self.max_fit_rows,
        )
        self.classes_ = sorted(pdf[self.label_col].astype(str).unique())
        idx = {c: i for i, c in enumerate(self.classes_)}
        y = pdf[self.label_col].astype(str).map(idx).to_numpy()
        n, k = len(X), len(self.classes_)
        onehot = np.zeros((n, k))
        onehot[np.arange(n), y] = 1.0

        bounds_all, B = self._bin_features(X)
        scores = np.zeros((n, k))
        self.trees_ = []
        for _ in range(self.n_rounds):
            z = scores - scores.max(axis=1, keepdims=True)
            e = np.exp(z)
            p = e / e.sum(axis=1, keepdims=True)
            grad = p - onehot
            hess = p * (1.0 - p)
            round_trees = []
            for c in range(k):
                tree = self._grow_tree(B, bounds_all, grad[:, c], hess[:, c])
                round_trees.append(tree)
                scores[:, c] += self.learning_rate * self._predict_tree(
                    tree, X
                )
            self.trees_.append(round_trees)
        return self


class NumpyCatBoostClassifier(NumpyGBDTClassifier):
    """The reference's CatBoost family (`DefPosModel.ipynb` cell 16's
    best-accuracy library) as the SEVENTH model family — the two
    structural signatures of the CatBoost algorithm (Prokhorenkova et
    al., NeurIPS 2018), in pure NumPy:

    - OBLIVIOUS (symmetric) TREES: every level of a tree applies ONE
      shared (feature, border) test, so a depth-d tree is a 2^d-leaf
      decision TABLE — the structure that makes CatBoost inference a
      few bit-ops per tree and acts as a strong regularizer. Split
      search picks the border maximizing the TOTAL second-order gain
      summed across all current leaves; candidate borders are
      quantile-thinned distinct-value midpoints (≤ `max_borders`,
      CatBoost's own 254-border quantization).
    - ORDERED leaf-value estimation (`ordered=True`, the default):
      during TRAINING, example i's running-score update uses the leaf
      value estimated only from examples BEFORE i in a seed-pinned
      permutation (−G_{<i}/(H_{<i}+λ), empty prefix → 0) — the
      paper's prediction-shift antidote (§4): no example's own target
      leaks into the gradient it will be scored with next round. The
      SHIPPED leaf value is the full-leaf Newton weight, as in
      CatBoost's final model.

    - ORDERED TARGET STATISTICS (round 12, `cat_feature_cols`): each
      categorical column becomes k per-class numeric features — for
      example i under permutation σ, the smoothed class-share of its
      category among examples BEFORE i only (paper §3.2:
      (Σ_{j<σi, cat_j=cat_i} 1[y_j=c] + a·p_c) / (#earlier + a), prior
      p_c = the class share, weight `prior_weight`) — the
      target-leakage-free encoding that is CatBoost's other headline
      idea. INFERENCE uses the full-training-data statistic per
      category (CatBoost's own convention); unseen categories and
      empty prefixes fall back to the prior. NULL is its own category
      (sentinel-coded, documented divergence: CatBoost errors on NaN
      cat features).
    - MULTI-PERMUTATION training (`n_permutations` > 1): CatBoost
      draws s permutations and uses a different one per iteration to
      average away any single ordering's bias; here round r uses
      permutation r mod s for BOTH its ordered TS features and its
      ordered leaf estimation, each permutation's TS matrix binned
      once per fit.

    Honest scope notes (the parts of CatBoost NOT here, and why):
    feature combinations (greedy TS of cat×cat crosses) are a
    combinatorial search irrelevant at these frame widths; plain
    boosting is available via `ordered=False` (CatBoost's
    boosting_type=Plain). The objective is the siblings' multiclass
    softprob with Newton leaf weights — the shared math of the
    boosted-family trio, which is what makes the stump-equivalence
    test meaningful.

    Deterministic under the family discipline: the permutation is the
    single seed-pinned rng draw; borders, gains, and tie-breaks
    (lowest feature, lowest border) are order-free given the collected
    frame — refits are bit-identical and tests pin exact trees. Trees
    materialize into the shared flat-array layout (each level's split
    replicated across its 2^level nodes), so `transform` /
    `_predict_tree` / `evaluate` are inherited — scoring is the same
    Arrow-batched broadcast-ensemble mapInPandas."""

    def __init__(
        self,
        label_col: str,
        feature_cols: list[str],
        n_rounds: int = 40,
        depth: int = 4,
        learning_rate: float = 0.3,
        reg_lambda: float = 1.0,
        max_borders: int = 254,
        ordered: bool = True,
        seed: int = SEED,
        max_fit_rows: int = 1_000_000,
        cat_feature_cols: list[str] | None = None,
        n_permutations: int = 1,
        prior_weight: float = 1.0,
    ) -> None:
        if not 1 <= depth <= 16:
            raise ValueError("depth must be in [1, 16]")
        if max_borders < 1:
            raise ValueError("max_borders must be >= 1")
        if not 1 <= n_permutations <= 64:
            # each permutation materializes its own TS feature matrix
            # (max_fit_rows x classes x cat-columns doubles) on the
            # driver; CatBoost itself uses s = O(log n) ~ 4, so 64 is
            # far above any sane setting and keeps memory bounded
            raise ValueError("n_permutations must be in [1, 64]")
        if prior_weight <= 0:
            raise ValueError(
                "prior_weight must be > 0 (it is the TS smoothing "
                "denominator for empty prefixes)"
            )
        overlap = set(cat_feature_cols or []) & set(feature_cols)
        if overlap:
            raise ValueError(
                f"cat_feature_cols overlap feature_cols: {sorted(overlap)}"
                " — a column is either numeric or categorical, not both"
            )
        self.label_col = label_col
        self.feature_cols = list(feature_cols)
        self.n_rounds = n_rounds
        self.depth = depth
        self.learning_rate = learning_rate
        self.reg_lambda = reg_lambda
        self.max_borders = max_borders
        self.ordered = ordered
        self.seed = seed
        self.max_fit_rows = max_fit_rows
        self.cat_feature_cols = list(cat_feature_cols or [])
        self.n_permutations = n_permutations
        self.prior_weight = prior_weight

    # -- numpy core -----------------------------------------------------
    def _borders(self, X):
        """Per-feature candidate borders: distinct-value midpoints,
        quantile-thinned to max_borders (CatBoost's quantization)."""
        import numpy as np

        out = []
        for j in range(X.shape[1]):
            d = np.unique(X[:, j])
            b = (d[:-1] + d[1:]) / 2.0
            if len(b) > self.max_borders:
                sel = np.unique(
                    np.round(
                        np.linspace(0, len(b) - 1, self.max_borders)
                    ).astype(np.int64)
                )
                b = b[sel]
            out.append(b)
        return out

    def _grow_oblivious(self, B, borders, g, h, perm):
        """One oblivious tree: a list of per-level (feature, border)
        + per-leaf Newton values + the per-example ORDERED training
        values (prefix Newton estimates along `perm`).

        Split search is HISTOGRAM-vectorized like CatBoost's own: rows
        are pre-binned once per fit (`B`), and each level evaluates
        every border of a feature from one (leaf, bin) bincount +
        per-leaf prefix sums — O(n + leaves·bins) per feature per
        level, not O(n·borders) (the naive masked scan is ~10⁹ ops per
        tree on the contract's 44k-row frames; this is ~10⁶). Measured
        16.3 s for 10 rounds × 18 classes × 11 features × depth 4 on
        a 44k-row frame — the reference's own DefCoverage scale — and
        bit-identical splits/values to the masked scan it replaced
        (the q92 pinned VALUES did not move)."""
        import numpy as np

        lam = self.reg_lambda
        n = len(g)
        leaf = np.zeros(n, dtype=np.int64)
        n_leaves = 1
        splits: list[tuple[int, float]] = []
        for _level in range(self.depth):
            Gl = np.bincount(leaf, weights=g, minlength=n_leaves)
            Hl = np.bincount(leaf, weights=h, minlength=n_leaves)
            base = (Gl * Gl / (Hl + lam)).sum()
            best_gain, best_j, best_t = 0.0, -1, 0.0
            for j in range(B.shape[1]):
                nb = len(borders[j]) + 1
                if nb < 2:
                    continue
                code = leaf * nb + B[:, j]
                bg = np.bincount(
                    code, weights=g, minlength=n_leaves * nb
                ).reshape(n_leaves, nb)
                bh = np.bincount(
                    code, weights=h, minlength=n_leaves * nb
                ).reshape(n_leaves, nb)
                cg = np.cumsum(bg, axis=1)[:, :-1]
                ch = np.cumsum(bh, axis=1)[:, :-1]
                # per-border total gain across leaves; empty sides are
                # harmless (0²/(0+λ))
                gains = (
                    (cg * cg / (ch + lam)).sum(axis=0)
                    + (
                        (Gl[:, None] - cg) ** 2
                        / (Hl[:, None] - ch + lam)
                    ).sum(axis=0)
                    - base
                ) / 2.0
                pos = int(np.argmax(gains))  # first max → lowest border
                # strict > keeps the lowest feature index on ties
                if gains[pos] > best_gain:
                    best_gain = float(gains[pos])
                    best_j, best_t = j, float(borders[j][pos])
            if best_j < 0:
                break
            splits.append((best_j, best_t))
            pos_idx = int(
                np.searchsorted(borders[best_j], best_t, side="left")
            )
            leaf = leaf * 2 + (B[:, best_j] > pos_idx).astype(np.int64)
            n_leaves *= 2
        G = np.bincount(leaf, weights=g, minlength=n_leaves)
        H = np.bincount(leaf, weights=h, minlength=n_leaves)
        values = -G / (H + lam)
        if self.ordered:
            train_vals = np.zeros(n)
            inv = perm  # perm[k] = example index at ordered position k
            pg = {}
            ph = {}
            for k in inv:
                lf = leaf[k]
                sg, sh = pg.get(lf, 0.0), ph.get(lf, 0.0)
                train_vals[k] = -sg / (sh + lam) if sh > 0 else 0.0
                pg[lf] = sg + g[k]
                ph[lf] = sh + h[k]
        else:
            train_vals = values[leaf]
        return splits, values, train_vals

    @staticmethod
    def _materialize(splits, values, n_features):
        """Oblivious table → the siblings' flat-array tree (each
        level's shared split replicated across its 2^level nodes)."""
        import numpy as np

        depth = len(splits)
        feat, thr, left, right, val = [], [], [], [], []

        def build(level, leaf_lo):
            node = len(feat)
            if level == depth:
                feat.append(-1)
                thr.append(0.0)
                left.append(-1)
                right.append(-1)
                val.append(float(values[leaf_lo]))
                return node
            j, t = splits[level]
            feat.append(j)
            thr.append(t)
            left.append(-1)
            right.append(-1)
            val.append(0.0)
            l = build(level + 1, leaf_lo * 2)
            r = build(level + 1, leaf_lo * 2 + 1)
            left[node] = l
            right[node] = r
            return node

        build(0, 0)
        return (
            np.array(feat),
            np.array(thr),
            np.array(left),
            np.array(right),
            np.array(val),
        )

    # -- ordered target statistics (round 12) ---------------------------
    @staticmethod
    def _cat_strings(col):
        """pandas column → category strings; NULL is its own category
        (sentinel the data can't contain: pandas NA never str()s to
        it)."""
        sent = "\x00null\x00"
        isna = col.isna()
        s = col.astype(object).astype(str)
        # the sentinel is unreachable from any SANE value, but a
        # malicious/corrupt string could collide and silently pool
        # with the NULL category — fail loudly instead. Pandas-level
        # equality (Python __eq__ per element) is required here:
        # numpy's object-array == against a \x00-prefixed scalar
        # short-circuits on the NUL like a C string and never matches.
        if bool(((s == sent) & ~isna).any()):
            raise ValueError(
                f"categorical column {col.name!r} contains the "
                "reserved NULL sentinel '\\x00null\\x00' as a real "
                "value — scrub control characters first"
            )
        return s.where(~isna, sent).to_numpy(dtype=object)

    @staticmethod
    def _ordered_ts(vals, onehot, perm, prior, a):
        """(n,) category strings → (n, k) ordered target statistics
        under permutation `perm` (paper §3.2): row i's column c is
        (Σ onehot[j, c] over j with cat_j = cat_i AND σj < σi + a·p_c)
        / (#such j + a). Vectorized: stable-sort the permutation
        stream by category so each category's rows sit contiguously
        IN permutation order, take exclusive prefix sums within each
        group, then scatter back."""
        import numpy as np

        n, k = onehot.shape
        _, codes = np.unique(vals, return_inverse=True)
        codes_o = codes[perm]
        oh_o = onehot[perm]
        sort_idx = np.argsort(codes_o, kind="stable")
        g = codes_o[sort_idx]
        ohs = oh_o[sort_idx]
        csum = np.cumsum(ohs, axis=0)
        cnt = np.arange(1, n + 1, dtype=np.float64)
        starts = np.r_[0, np.flatnonzero(np.diff(g)) + 1]
        start_of = np.repeat(starts, np.diff(np.r_[starts, n]))
        base = np.zeros((n, k))
        base_cnt = np.zeros(n)
        nz = start_of > 0
        base[nz] = csum[start_of[nz] - 1]
        base_cnt[nz] = cnt[start_of[nz] - 1]
        prefix = csum - ohs - base
        pcnt = cnt - 1.0 - base_cnt
        ts_sorted = (prefix + a * prior) / (pcnt[:, None] + a)
        ts = np.empty((n, k))
        ts[perm[sort_idx]] = ts_sorted
        return ts

    @staticmethod
    def _full_ts(vals, onehot, prior, a):
        """Full-training-data TS per category — what the SHIPPED model
        applies at inference (CatBoost's convention; ordering exists
        to de-bias training only). Unseen categories get the prior:
        (0 + a·p)/(0 + a) = p."""
        import numpy as np

        cats, codes = np.unique(vals, return_inverse=True)
        k = onehot.shape[1]
        sums = np.zeros((len(cats), k))
        np.add.at(sums, codes, onehot)
        cnts = np.bincount(codes, minlength=len(cats)).astype(np.float64)
        table = (sums + a * prior) / (cnts[:, None] + a)
        return {str(c): table[i].copy() for i, c in enumerate(cats)}

    def _matrix(self, pdf):
        """Numeric columns + per-cat-column TS blocks, in
        `cat_feature_cols` order — the layout every tree was trained
        on. Overrides the parent's hook so the inherited Arrow-batched
        transform scores categorical models unchanged."""
        import numpy as np

        X = pdf[self.feature_cols].to_numpy(dtype=np.float64)
        if not self.cat_feature_cols:
            return X
        prior = self.ts_prior_
        blocks = [X]
        for col in self.cat_feature_cols:
            vals = self._cat_strings(pdf[col])
            # vectorized lookup against the fit-time sorted key table
            # (scoring is corpus-scale — a per-row dict .get here would
            # be the row-at-a-time Python the house bans in hot paths)
            keys = self.ts_keys_[col]
            pos = np.clip(
                np.searchsorted(keys, vals), 0, len(keys) - 1
            )
            hit = keys[pos] == vals
            blocks.append(
                np.where(
                    hit[:, None], self.ts_tables_[col][pos], prior
                )
            )
        return np.hstack(blocks)

    def fit(self, df: DataFrame) -> "NumpyCatBoostClassifier":
        import numpy as np

        cats = self.cat_feature_cols
        pdf, X = _fit_frame(
            df, "NumpyCatBoostClassifier", self.label_col,
            self.feature_cols, self.max_fit_rows, extra_cols=cats,
        )
        self.classes_ = sorted(pdf[self.label_col].astype(str).unique())
        idx = {c: i for i, c in enumerate(self.classes_)}
        y = pdf[self.label_col].astype(str).map(idx).to_numpy()
        n, k = len(X), len(self.classes_)
        onehot = np.zeros((n, k))
        onehot[np.arange(n), y] = 1.0

        rng = np.random.default_rng(self.seed)
        perms = [rng.permutation(n) for _ in range(self.n_permutations)]

        # one feature matrix per permutation when TS features depend
        # on the ordering; ONE matrix (and one binning) otherwise —
        # the all-numeric path is byte-identical to pre-round-12 fits
        if cats:
            a = self.prior_weight
            prior = onehot.mean(axis=0)
            self.ts_prior_ = prior
            cat_vals = {col: self._cat_strings(pdf[col]) for col in cats}
            self.ts_maps_ = {
                col: self._full_ts(cat_vals[col], onehot, prior, a)
                for col in cats
            }
            # sorted-key arrays for transform's vectorized searchsorted
            self.ts_keys_ = {}
            self.ts_tables_ = {}
            for col in cats:
                ks = sorted(self.ts_maps_[col])
                self.ts_keys_[col] = np.array(ks, dtype=object)
                self.ts_tables_[col] = np.vstack(
                    [self.ts_maps_[col][x] for x in ks]
                )
            mats = [
                np.hstack(
                    [X]
                    + [
                        self._ordered_ts(
                            cat_vals[col], onehot, perm, prior, a
                        )
                        for col in cats
                    ]
                )
                for perm in perms
            ]
        else:
            mats = [X]
        binned = []
        feat_counts = []
        for M in mats:
            borders = self._borders(M)
            B = np.zeros(M.shape, dtype=np.int64)
            for j in range(M.shape[1]):
                B[:, j] = np.searchsorted(borders[j], M[:, j], side="left")
            binned.append((borders, B))
            feat_counts.append(M.shape[1])
        # the float64 matrices are only needed for binning; holding
        # them through the boosting loop (max_fit_rows × n_permutations
        # near the 64 cap) roughly doubles peak driver memory
        del mats

        scores = np.zeros((n, k))
        self.trees_ = []
        for r in range(self.n_rounds):
            perm = perms[r % len(perms)]
            borders, B = binned[r % len(binned)]
            n_feats = feat_counts[r % len(feat_counts)]
            z = scores - scores.max(axis=1, keepdims=True)
            e = np.exp(z)
            p = e / e.sum(axis=1, keepdims=True)
            grad = p - onehot
            hess = p * (1.0 - p)
            round_trees = []
            for c in range(k):
                splits, values, train_vals = self._grow_oblivious(
                    B, borders, grad[:, c], hess[:, c], perm
                )
                round_trees.append(
                    self._materialize(splits, values, n_feats)
                )
                scores[:, c] += self.learning_rate * train_vals
            self.trees_.append(round_trees)
        return self


def predict_for_play(
    model, features: DataFrame, game_id: int, play_id: int
) -> DataFrame:
    """X9: per-play inference (`DefPosModel.ipynb` cell 7) — filter
    first so only the play's rows are scored. `model` is anything with
    the Transformer calling convention (a fitted `PipelineModel`, or
    `RuleCoverageModel` for the hash-checked driver path)."""
    rows = features.filter(
        (F.col("gameId") == game_id) & (F.col("playId") == play_id)
    )
    return model.transform(rows)

"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents that LOOK LIKE a curated
target set by importance-weighting hashed n-gram features.

The published recipe, re-expressed Spark-first:

1. featurize every document as a bag of hashed unigrams+bigrams over
   ``dim`` buckets (the paper's 10k-bucket hashed n-gram space);
2. fit two smoothed multinomials — target p and raw q — as per-bucket
   counts (two dim-bounded aggregates);
3. score each raw document with its log importance weight
   log w(x) = Σ_features [ log p(bucket) − log q(bucket) ];
4. resample without replacement via Gumbel top-k over the weights
   (equivalent to Efraimidis–Spirakis with w = e^{log w}).

Where this sits among the engine's other selection filters:
`quality_clf` is a TRAINED discriminative gate, `ngram_lm` an
absolute-fluency gate; DSIR is the distribution-MATCHING selector —
"make the sample look like Wikipedia" — and completes the published
LLM-data-selection triad.

Determinism (the suite-wide discipline): each bucket's log-ratio is a
double `ln` quantized ONCE to decimal(38,15) (the `ngram_lm` policy),
so per-document sums are exact and partitioning-independent; the
Gumbel rank key runs in log space — ln(−ln(u)) − λ·logw, a monotone
transform of the ES key that never overflows e^{logw} — rounded to
6 dp with an id tie-break (the `weighted_fixed_k` / bm25_topk
discipline: last-ulp libm drift across engines is absorbed by the
rounding grain). u is the keyed-hash uniform shifted to (0,1]; the
u=1 corner makes ln(−ln(1)) NULL on both engines and `asc_nulls_last`
ranks it dead last on both.

Scale (100 TB raw corpus): the model is TWO dim-row tables built by
map-side-combined aggregates over the feature explode (the only
corpus-scale shuffles, 8-byte keys); scoring broadcast-joins the
complete dim-row log-ratio table — the corpus itself never shuffles
except the per-doc re-aggregate keyed by the id the explode preserved;
selection is TakeOrderedAndProject (per-partition top-k + driver merge
of k rows), never a global sort. Nothing is quadratic; the target set
is typically tiny and its aggregate cost vanishes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import (
    HASH64_SPAN,
    normalize_text,
    portable_hash64,
    tagged_hash64,
    tokens,
    word_shingles,
)

#: fixed-scale decimal for quantized log-ratios (the ngram_lm policy)
_DEC = "decimal(38,15)"

#: default hashed-feature space (the paper uses 10^4; 2^11 keeps the
#: model literal-broadcast tiny while leaving bucket collisions rare
#: on the synthetic vocab)
DEFAULT_DIM = 2048


def dsir_features(text: Column) -> Column:
    """Hashed-n-gram feature bag: normalized unigrams + bigrams as one
    array<string>. Empty documents yield an empty array (they have no
    evidence and later drop out of scoring, like `ngram_lm`)."""
    w = F.filter(tokens(normalize_text(text)), lambda t: t != "")
    return F.concat(w, word_shingles(w, 2))


def dsir_bucket_counts(
    df: DataFrame, text_col: str, dim: int = DEFAULT_DIM
) -> DataFrame:
    """Per-bucket feature counts (bucket, c) for one corpus: ONE
    explode + ONE map-side-combined aggregate whose output is
    dim-bounded. Buckets with no mass are absent (densified by
    `dsir_model`)."""
    return (
        df.select(F.explode(dsir_features(F.col(text_col))).alias("feat"))
        .select((portable_hash64(F.col("feat")) % dim).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def dsir_model(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    dim: int = DEFAULT_DIM,
    alpha: float = 1.0,
) -> DataFrame:
    """The importance model: a COMPLETE dim-row (bucket, lr) table,
    lr = dec(ln((c_t+α)/(T_t+α·dim))) − dec(ln((c_r+α)/(T_r+α·dim)))
    in decimal(38,15). Completeness (every bucket in [0,dim) present,
    add-α floor for unseen ones) lets scoring use a plain broadcast
    inner join — no missing-bucket coalesce logic downstream.

    Totals ride as lazy one-row frames cross-joined in (the lm_train
    round-8 pattern): building the model triggers no driver job."""
    if not alpha > 0:
        raise ValueError(
            f"alpha must be > 0 (got {alpha}): an unsmoothed bucket "
            "absent from either corpus makes ln(0) NULL and silently "
            "poisons every document touching it"
        )
    spark = target_counts.sparkSession
    buckets = spark.range(dim).select(F.col("id").alias("bucket"))
    tt = target_counts.agg(F.sum("c").cast("double").alias("__tt"))
    tr = raw_counts.agg(F.sum("c").cast("double").alias("__tr"))

    def logp(c: Column, tot: Column) -> Column:
        num = F.coalesce(c, F.lit(0)).cast("double") + F.lit(alpha)
        den = tot + F.lit(alpha * dim)
        return F.log(num / den).cast(_DEC)

    return (
        buckets.join(
            target_counts.withColumnRenamed("c", "__ct"), "bucket", "left"
        )
        .join(raw_counts.withColumnRenamed("c", "__cr"), "bucket", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
        .select(
            "bucket",
            (
                logp(F.col("__ct"), F.col("__tt"))
                - logp(F.col("__cr"), F.col("__tr"))
            )
            .cast(_DEC)
            .alias("lr"),
        )
    )


def dsir_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: DataFrame,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Per-document log importance weight: (id_col, n_feats, logw)
    with logw the EXACT decimal sum of the document's bucket
    log-ratios (with multiplicity — it's a bag). The model broadcasts;
    the corpus's only shuffle is the per-doc re-aggregate on its own
    id. Documents with no features are absent."""
    feats = df.select(
        F.col(id_col),
        F.explode(dsir_features(F.col(text_col))).alias("feat"),
    ).select(
        id_col, (portable_hash64(F.col("feat")) % dim).alias("bucket")
    )
    return (
        feats.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("lr").cast(_DEC).alias("logw"),
        )
    )


def dsir_gumbel_key(
    id_col: str,
    logw_col: str = "logw",
    lam: float = 1.0,
    seed: str = "dsir:v1",
) -> Column:
    """The selection rank key, SMALLER = better: round 6 of
    ln(−ln(u)) − λ·logw, the log-space Efraimidis–Spirakis key for
    w = e^{λ·logw} (Gumbel top-k over importance weights, temperature
    1/λ) — monotone-identical to −ln(u)/w but immune to e^{logw}
    overflow. u = (hash+1)/2^60 ∈ (0,1]."""
    u = (
        tagged_hash64(seed, F.col(id_col).cast("string")) + F.lit(1)
    ) / F.lit(float(HASH64_SPAN))
    return F.round(
        F.log(-F.log(u)) - F.lit(lam) * F.col(logw_col).cast("double"), 6
    )


def dsir_resample(
    weights: DataFrame,
    id_col: str,
    k: int,
    lam: float = 1.0,
    seed: str = "dsir:v1",
    logw_col: str = "logw",
) -> DataFrame:
    """Gumbel top-k resampling WITHOUT replacement: keep the k rows
    minimizing the log-space ES key. TakeOrderedAndProject — scale-
    safe at any corpus size; the id tie-break makes the draw a pure
    function of (seed, λ, ids, weights)."""
    key = dsir_gumbel_key(id_col, logw_col, lam, seed)
    return weights.orderBy(
        key.asc_nulls_last(), F.col(id_col).asc()
    ).limit(k)

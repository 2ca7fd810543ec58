"""Corpus sampling operators for training-data pipelines: deterministic
hash-Bernoulli sampling, weighted per-domain mixing, and a global
pseudorandom reorder ("corpus shuffle").

These complement `ml.hash_split` (row-stable train/test membership):
here the use case is corpus COMPOSITION — downsample a 100 TB crawl to
a token budget, rebalance domains to target mixture weights (the
"30% web / 20% code / ..." recipe every LLM data pipeline publishes),
and write the result in a reproducible pseudorandom order so
sequential training readers see a well-mixed stream.

Design for 100 TB:
- membership is a pure codegen function of the row's key (md5-derived
  `portable_hash64`), so sampling is a FILTER — no shuffle, no RNG
  state, no `sample()` nondeterminism under retries/speculation, and
  re-runs (or incremental extensions of the corpus) never flip
  previously-sampled rows.
- `weighted_domain_sample` is the same filter with a per-domain rate
  looked up from a literal CASE map — domains needing no downsampling
  pass rate 1.0 and cost nothing.
- `deterministic_shuffle` is a global sort on the hash — Spark range-
  partitions the sort key, and since the key is uniform the partitions
  balance by construction; downstream writers get mixed, evenly-sized
  files. (A true permutation, unlike `repartition(shuffle=True)` whose
  round-robin depends on input partitioning.)

Everything is engine-portable: the DuckDB oracles reproduce membership
and order bit-for-bit from the same md5 prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import HASH64_SPAN, tagged_hash64


def hash_uniform(key: Column, seed: str = "sample:v1") -> Column:
    """Deterministic uniform [0,1) from a row key: the 60-bit keyed
    hash (`text.tagged_hash64` — the same convention `ml.hash_split`
    uses), scaled. Distinct seeds give independent draws over the same
    keys (versioned re-sampling without touching data)."""
    return tagged_hash64(seed, key.cast("string")) / F.lit(
        float(HASH64_SPAN)
    )


def _require_nonnull_key(df: DataFrame, key_col: str, op: str) -> DataFrame:
    """Every sampler here derives membership/order from
    `tagged_hash64(seed, key)`, and `concat_ws` SKIPS NULL args — so
    all NULL-key rows share ONE hash value (hash of the bare seed).
    That silently correlates their membership (all in or all out of
    every sample), and with the key tie-break also NULL their relative
    order goes partition-dependent. A sampling key must identify the
    row; error loudly instead of sampling garbage (round-10 audit —
    same per-row assert discipline as rolling_anomaly's overflow
    guard). Costs one codegen predicate in the stage the operator
    already runs; no extra shuffle."""
    return df.filter(
        F.when(
            F.col(key_col).isNull(),
            F.raise_error(
                F.lit(
                    f"{op}: NULL value in key column {key_col!r} — "
                    "sampling keys must be non-null (NULL keys all "
                    "share one hash and cannot be sampled "
                    "deterministically)"
                )
            ).cast("boolean"),
        ).otherwise(F.lit(True))
    )


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: str = "sample:v1"
) -> DataFrame:
    """Bernoulli(rate) sample, membership a pure function of the key."""
    df = _require_nonnull_key(df, key_col, "hash_sample")
    return df.filter(hash_uniform(F.col(key_col), seed) < F.lit(rate))


def weighted_domain_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    rates: dict[str, float],
    seed: str = "mix:v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Corpus mixing: keep each row with its domain's Bernoulli rate.

    `rates` maps domain values (e.g. language, source) to keep
    probabilities; unlisted domains get `default_rate` (0.0 = drop
    unknown domains — the safe default for a curated mixture). Rates
    are literals folded into one CASE expression, so the whole operator
    is a codegen filter: no join, no shuffle, no per-domain passes."""
    rate = F.lit(float(default_rate))
    for dom, r in sorted(rates.items()):
        rate = F.when(F.col(domain_col) == dom, F.lit(float(r))).otherwise(
            rate
        )
    df = _require_nonnull_key(df, key_col, "weighted_domain_sample")
    return df.filter(hash_uniform(F.col(key_col), seed) < rate)


def token_budget_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    weight_col: str,
    budgets: dict[str, float],
    seed: str = "budget:v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Corpus mixing by TOKEN BUDGET instead of rate: keep each
    domain's rows with probability min(1, budget_d / Σ weight_d), so
    the sampled token mass concentrates on the requested budget — the
    way mixture recipes are actually specified ("300 B tokens of web,
    50 B of code"), with the rate derived from the data rather than
    hand-tuned. Domains at or under budget pass untouched (rate 1);
    unlisted domains get `default_rate` (0 = drop, the curated-recipe
    default).

    Spark shape: per-domain totals are ONE tiny aggregate (map-side
    combined, rows = domain cardinality) broadcast back; membership is
    then the same pure keyed-hash filter as `hash_sample` — stable
    under re-runs and corpus growth of OTHER domains (a domain's own
    growth rescales its rate, as a fixed budget demands).

    Weights sum through fixed-scale decimal (exact + associative to
    6 dp, so fractional weights neither truncate nor drift with
    partition order); a budgeted domain whose weights are entirely
    NULL has no measurable mass and falls back to `default_rate` —
    Spark's `least()` skips NULLs, so without the explicit coalesce
    the NULL division would silently evaluate to rate 1.0 and keep
    the whole domain despite a finite budget."""
    if "__tot" in df.columns:
        raise ValueError(
            "token_budget_sample: df already carries reserved column "
            "'__tot'; drop or rename it first"
        )
    totals = df.groupBy(domain_col).agg(
        F.sum(F.col(weight_col).cast("decimal(25,6)"))
        .cast("double")
        .alias("__tot")
    )
    rate = F.lit(float(default_rate))
    for dom, b in sorted(budgets.items()):
        rate = F.when(
            F.col(domain_col) == dom,
            F.least(
                F.lit(1.0),
                F.coalesce(
                    F.lit(float(b)) / F.col("__tot"),
                    F.lit(float(default_rate)),
                ),
            ),
        ).otherwise(rate)
    # LEFT join: a NULL domain matches no totals row and must fall
    # through to default_rate (the same contract as
    # weighted_domain_sample's CASE), not silently vanish in an inner
    # join
    df = _require_nonnull_key(df, key_col, "token_budget_sample")
    return (
        df.join(F.broadcast(totals), domain_col, "left")
        .filter(hash_uniform(F.col(key_col), seed) < rate)
        .drop("__tot")
    )


def temperature_domain_sample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    weight_col: str,
    alpha: float,
    total_budget: float,
    seed: str = "tmix:v1",
) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual α-sampling
    recipe: sample domain d with probability ∝ mass_d^α, α<1 damping
    the head so low-resource domains are over-represented relative to
    their raw share). Given a `total_budget` of weight units, each
    domain keeps rows at rate

        rate_d = min(1, total_budget · p_d / mass_d),
        p_d    = mass_d^α / Σ mass^α

    so the sampled mass approximates the temperature-flattened
    mixture. α=1 reduces to proportional (uniform rate); α=0 to equal
    mass per domain (`token_budget_sample` with equal budgets).

    Spark shape: one tiny per-domain aggregate (decimal-summed,
    domain-cardinality rows) joined back broadcast with the α-powered
    share computed per row; membership is the usual keyed-hash codegen
    filter — rows never shuffle, and membership is stable under
    re-runs (same guarantees as `hash_sample`). Zero- or NULL-mass
    domains drop (no measurable mass ⇒ nothing to budget).

    Engine-parity note: `pow(mass, α)` is correctly-rounded only for
    dyadic α like 0.5 (= sqrt); arbitrary α may drift 1 ulp between
    engines, which matters only if a row's 60-bit hash lands inside
    that ulp of its domain's rate — vanishing at corpus scale, but
    the q64 parity branch pins α=0.5 where both engines are exact."""
    if "__mass" in df.columns or "__sa" in df.columns:
        raise ValueError(
            "temperature_domain_sample: df carries a reserved column "
            "('__mass'/'__sa'); drop or rename it first"
        )
    mass = F.sum(F.col(weight_col).cast("decimal(25,6)")).cast("double")
    totals = df.groupBy(domain_col).agg(mass.alias("__mass"))
    powed = totals.select(
        domain_col,
        "__mass",
        F.pow(F.col("__mass"), F.lit(float(alpha))).alias("__sa"),
    )
    # Σ mass^α folded in ASCENDING value order: collect_list order is
    # partition-dependent and float addition is not associative, so a
    # plain sum could differ between runs (and engines) in the last
    # ulp; the sorted fold is bit-deterministic and the domain list is
    # tiny (domain cardinality, not rows)
    denom = powed.agg(
        F.aggregate(
            F.array_sort(F.collect_list("__sa")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("__den")
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(float(total_budget))
        * (F.col("__sa") / F.col("__den"))
        / F.col("__mass"),
    )
    df = _require_nonnull_key(df, key_col, "temperature_domain_sample")
    return (
        df.join(F.broadcast(powed), domain_col)
        .crossJoin(F.broadcast(denom))
        .filter(
            (F.col("__mass") > 0)
            & (hash_uniform(F.col(key_col), seed) < rate)
        )
        .drop("__mass", "__sa", "__den")
    )


def stratified_fixed_k(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int,
    seed: str = "strata:v1",
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, deterministically: rank
    each group by the keyed hash and keep the first k. The distributed,
    re-runnable replacement for per-group reservoir sampling —
    membership is a pure function of (seed, keys), so eval-set draws
    are reproducible and append-stable for untouched groups.

    Cost: ONE shuffle on `group_col` for the window rank (same as any
    per-group top-k); skewed group sizes are bounded by the window's
    streaming rank, not materialized per-group state. The hash is
    unique per key with overwhelming probability, but `key_col` breaks
    hypothetical ties so the result is total-order deterministic."""
    from pyspark.sql import Window

    if "__rn" in df.columns:
        # the internal rank column would silently shadow (and then
        # drop) a caller column of the same name
        raise ValueError(
            "stratified_fixed_k: df already carries reserved column "
            "'__rn'; drop or rename it first"
        )
    u = hash_uniform(F.col(key_col), seed)
    w = Window.partitionBy(group_col).orderBy(u, F.col(key_col))
    df = _require_nonnull_key(df, key_col, "stratified_fixed_k")
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_fixed_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    group_col: str | None = None,
    seed: str = "wsample:v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): keep the k rows maximizing u^(1/w) — equivalently
    minimizing −ln(u)/w — where u is the row's keyed-hash uniform and
    w its weight. Inclusion probability is proportional-to-weight
    without replacement: the quality-weighted eval-draw / curation
    primitive ("3 docs per domain, preferring high-quality ones")
    that `stratified_fixed_k` (uniform) can't express.

    Deterministic like every sampler here: u is a pure function of
    (seed, key) shifted to (0, 1] so ln never sees 0, and the ES key
    rounds to 6 decimals before ranking with a `key_col` tie-break —
    the bm25_topk discipline: ln may drift in the last ulp across
    engines, the rounded rank key doesn't. Rows with NULL or ≤0
    weight are never sampled (they have no mass).

    Cost: grouped = ONE shuffle on `group_col` for the window rank
    (identical to `stratified_fixed_k`); global (`group_col=None`) =
    TakeOrderedAndProject (per-partition top-k + driver merge of k
    rows, never a global sort) — both scale-safe at any corpus size.
    """
    u = (
        tagged_hash64(seed, F.col(key_col).cast("string")) + F.lit(1)
    ) / F.lit(float(HASH64_SPAN))
    es = F.round(-F.log(u) / F.col(weight_col).cast("double"), 6)
    # NaN is GREATER than everything in Spark's ordering, so a NaN
    # weight passes `> 0` and poisons its ES key; exclude it with the
    # same no-mass rule as NULL/<=0 (round-10 audit)
    wd = F.col(weight_col).cast("double")
    eligible = _require_nonnull_key(df, key_col, "weighted_fixed_k").filter(
        F.col(weight_col).isNotNull() & ~F.isnan(wd) & (wd > 0)
    )
    if group_col is None:
        return eligible.orderBy(es.asc(), F.col(key_col).asc()).limit(k)
    from pyspark.sql import Window

    if "__es_rn" in df.columns:
        raise ValueError(
            "weighted_fixed_k: df already carries reserved column "
            "'__es_rn'; drop or rename it first"
        )
    w = Window.partitionBy(group_col).orderBy(es.asc(), F.col(key_col).asc())
    return (
        eligible.withColumn("__es_rn", F.row_number().over(w))
        .filter(F.col("__es_rn") <= k)
        .drop("__es_rn")
    )


def deterministic_shuffle(
    df: DataFrame, key_col: str, seed: str = "shuffle:v1"
) -> DataFrame:
    """Global pseudorandom reorder: sort by the keyed hash. The order
    is a pure function of (seed, keys) — reproducible across runs,
    engines, and cluster sizes; change `seed` for a fresh permutation
    per epoch. Cost is one range-partitioned sort on an 8-byte key.

    The key column itself tie-breaks the 60-bit hash: two colliding
    keys (expected past ~2^30 rows) would otherwise get
    partition-dependent relative order, breaking the pure-function
    contract exactly when the corpus is large enough to matter."""
    df = _require_nonnull_key(df, key_col, "deterministic_shuffle")
    return df.orderBy(hash_uniform(F.col(key_col), seed), F.col(key_col))

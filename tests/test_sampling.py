"""Semantics of the corpus-composition layer (operators/sampling.py):
membership and order must be pure functions of (seed, key) — stable
under corpus growth, partitioning, and re-runs — and must match an
independent pure-Python md5 reference."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.sampling import (
    deterministic_shuffle,
    hash_sample,
    hash_uniform,
    weighted_domain_sample,
)


def ref_u(key: int, seed: str) -> float:
    s = f"{seed}\x1f{key}".encode()
    return int(hashlib.md5(s).hexdigest()[:15], 16) / 16**15


def _df(spark, n=200):
    return spark.range(n).select(F.col("id").alias("k"))


def test_hash_uniform_matches_python_reference(spark):
    rows = _df(spark, 50).select(
        "k", hash_uniform(F.col("k"), "sample:v1").alias("u")
    ).collect()
    for r in rows:
        assert r.u == ref_u(r.k, "sample:v1")


def test_hash_sample_stable_under_growth(spark):
    """Growing the corpus never flips earlier rows' membership."""
    small = {r.k for r in hash_sample(_df(spark, 100), "k", 0.3).collect()}
    big = {r.k for r in hash_sample(_df(spark, 200), "k", 0.3).collect()}
    assert small == {k for k in big if k < 100}


def test_weighted_domain_sample_rates(spark):
    df = _df(spark, 300).withColumn("dom", (F.col("k") % 3).cast("string"))
    kept = weighted_domain_sample(
        df, "k", "dom", {"0": 1.0, "1": 0.5, "2": 0.0}
    ).collect()
    by_dom: dict[str, int] = {}
    for r in kept:
        by_dom[r.dom] = by_dom.get(r.dom, 0) + 1
    assert by_dom.get("0") == 100        # rate 1.0 keeps everything
    assert by_dom.get("2") is None       # rate 0.0 drops everything
    assert 20 <= by_dom.get("1", 0) <= 80  # Bernoulli(0.5) of 100
    # unlisted domains drop under the default rate
    assert weighted_domain_sample(
        df, "k", "dom", {"0": 1.0}
    ).filter(F.col("dom") != "0").count() == 0


def test_deterministic_shuffle_order(spark):
    """Output order equals the reference hash order and is invariant
    to input partitioning; a different seed permutes differently."""
    expected = sorted(range(120), key=lambda k: ref_u(k, "shuffle:v1"))
    a = [r.k for r in deterministic_shuffle(_df(spark, 120), "k").collect()]
    b = [
        r.k
        for r in deterministic_shuffle(
            _df(spark, 120).repartition(7), "k"
        ).collect()
    ]
    assert a == expected and b == expected
    c = [
        r.k
        for r in deterministic_shuffle(
            _df(spark, 120), "k", seed="shuffle:v2"
        ).collect()
    ]
    assert c != expected and sorted(c) == list(range(120))


def test_stratified_fixed_k(spark):
    """Exactly min(k, group size) per group, identical membership under
    repartitioning, and append-stability: adding a NEW group never
    changes existing groups' draws."""
    from bigdatabowl2024_25_spark.operators.sampling import stratified_fixed_k

    df = _df(spark, 250).withColumn("g", (F.col("k") % 4).cast("string"))
    # group '3' made tiny: only rows < 8 (8 % 4 == 3 pattern keeps 2)
    df = df.filter((F.col("g") != "3") | (F.col("k") < 8))
    out = stratified_fixed_k(df, "k", "g", 10).collect()
    sizes: dict[str, int] = {}
    for r in out:
        sizes[r.g] = sizes.get(r.g, 0) + 1
    assert sizes["0"] == sizes["1"] == sizes["2"] == 10
    assert sizes["3"] == 2  # min(k, |group|)

    a = sorted(r.k for r in out)
    b = sorted(
        r.k
        for r in stratified_fixed_k(df.repartition(9), "k", "g", 10).collect()
    )
    assert a == b

    grown = df.unionByName(
        _df(spark, 40).select(
            (F.col("k") + 1000).alias("k"), F.lit("9").alias("g")
        )
    )
    c = sorted(
        r.k
        for r in stratified_fixed_k(grown, "k", "g", 10).collect()
        if r.g != "9"
    )
    assert c == a

    # reserved-column guard (ADVICE r7): a caller '__rn' would be
    # silently shadowed then dropped
    import pytest

    with pytest.raises(ValueError, match="__rn"):
        stratified_fixed_k(df.withColumn("__rn", F.lit(1)), "k", "g", 10)


def test_token_budget_sample(spark):
    """Budget semantics: an over-budget domain downsamples to roughly
    its token budget, an under-budget domain passes untouched (rate 1),
    unlisted domains drop; membership is growth-stable for OTHER
    domains; the reserved state column is guarded."""
    from bigdatabowl2024_25_spark.operators.sampling import (
        token_budget_sample,
    )

    rows = (
        [(i, "a", 10) for i in range(1000)]          # 10k tokens
        + [(10000 + i, "b", 10) for i in range(30)]  # 300 tokens
        + [(20000 + i, "junk", 10) for i in range(50)]
    )
    df = spark.createDataFrame(rows, "k long, dom string, w long")
    budgets = {"a": 2500.0, "b": 1000.0}
    out = token_budget_sample(df, "k", "dom", "w", budgets)
    got = out.groupBy("dom").agg(
        F.sum("w").alias("tok"), F.count("*").alias("n")
    )
    by = {r.dom: (r.tok, r.n) for r in got.collect()}
    assert "junk" not in by                       # default_rate 0
    assert by["b"] == (300, 30)                   # under budget: all kept
    # over budget: expected 2500 tokens; Bernoulli σ ≈ √(250)·10 ≈ 158
    assert abs(by["a"][0] - 2500) <= 5 * 160
    # growth stability: adding a NEW domain never flips a's members
    a_before = {r.k for r in out.filter(F.col("dom") == "a").collect()}
    grown = df.unionByName(
        spark.createDataFrame([(90000, "c", 10)], "k long, dom string, w long")
    )
    out2 = token_budget_sample(grown, "k", "dom", "w", budgets)
    a_after = {r.k for r in out2.filter(F.col("dom") == "a").collect()}
    assert a_before == a_after
    import pytest

    with pytest.raises(ValueError, match="__tot"):
        token_budget_sample(
            df.withColumn("__tot", F.lit(1)), "k", "dom", "w", budgets
        )


def test_token_budget_sample_null_domain_gets_default_rate(spark):
    """NULL domains follow default_rate — the same contract as
    weighted_domain_sample — instead of vanishing in the totals join
    (review finding: the join was inner)."""
    from bigdatabowl2024_25_spark.operators.sampling import (
        token_budget_sample,
    )

    df = spark.createDataFrame(
        [(1, "a", 5), (2, None, 5), (3, None, 5)],
        "k long, dom string, w long",
    )
    kept = token_budget_sample(
        df, "k", "dom", "w", {"a": 1000.0}, default_rate=1.0
    )
    assert {r.k for r in kept.collect()} == {1, 2, 3}
    dropped = token_budget_sample(df, "k", "dom", "w", {"a": 1000.0})
    assert {r.k for r in dropped.collect()} == {1}


def test_token_budget_sample_all_null_weights_and_fractions(spark):
    """Round-8 ADVICE fixes: (a) a budgeted domain whose weights are
    ALL NULL has no measurable mass and follows default_rate — before
    the fix, least() skipped the NULL division and silently kept the
    whole domain at rate 1.0; (b) fractional weights sum exactly
    (decimal, not a bigint cast that truncated 0.5 to 0)."""
    from bigdatabowl2024_25_spark.operators.sampling import (
        token_budget_sample,
    )

    df = spark.createDataFrame(
        [(1, "nullw", None), (2, "nullw", None), (3, "a", 10.0)],
        "k long, dom string, w double",
    )
    budgets = {"nullw": 5.0, "a": 1000.0}
    dropped = token_budget_sample(df, "k", "dom", "w", budgets)
    assert {r.k for r in dropped.collect()} == {3}
    kept = token_budget_sample(
        df, "k", "dom", "w", budgets, default_rate=1.0
    )
    assert {r.k for r in kept.collect()} == {1, 2, 3}

    # fractional weights: 4000 rows x 0.5 tokens = 2000 total; budget
    # 500 => rate 0.25. The old bigint cast truncated every weight to
    # 0 => NULL-free zero total => rate 1.0 (kept all 4000)
    frac = spark.createDataFrame(
        [(i, "f", 0.5) for i in range(4000)], "k long, dom string, w double"
    )
    out = token_budget_sample(frac, "k", "dom", "w", {"f": 500.0})
    n = out.count()
    assert 700 <= n <= 1300  # ~1000 expected; 5 sigma ~ 140


def test_temperature_domain_sample(spark):
    """α-sampling semantics: at α=0.5 a domain 100x the mass of
    another gets only 10x the sampled mass (sqrt flattening); α=1 is
    proportional; zero-mass domains drop; membership is growth-stable
    for other domains."""
    from bigdatabowl2024_25_spark.operators.sampling import (
        temperature_domain_sample,
    )

    rows = (
        [(i, "big", 10.0) for i in range(10000)]   # 100k tokens
        + [(50000 + i, "small", 10.0) for i in range(100)]  # 1k tokens
        + [(90000, "empty", None)]
    )
    df = spark.createDataFrame(rows, "k long, dom string, w double")
    # budget 2k: shares sqrt(1e5):sqrt(1e3) ~ 10:1 -> big ~1818, small
    # ~182 tokens; small's rate 0.18, big's rate 0.018
    out = temperature_domain_sample(df, "k", "dom", "w", 0.5, 2000.0)
    got = {
        r.dom: r.tok
        for r in out.groupBy("dom").agg(F.sum("w").alias("tok")).collect()
    }
    assert "empty" not in got
    assert abs(got["big"] - 1818) <= 5 * 135   # 5 sigma
    assert abs(got["small"] - 182) <= 5 * 41
    # alpha=1: proportional -> both domains sampled at the same rate
    prop = temperature_domain_sample(df, "k", "dom", "w", 1.0, 2000.0)
    pg = {
        r.dom: r.tok
        for r in prop.groupBy("dom").agg(F.sum("w").alias("tok")).collect()
    }
    assert abs(pg["big"] - 2000 * 100 / 101) <= 5 * 140
    # growth stability: adding a new domain changes rates (den moves)
    # but never flips membership when rates stay equal -- here we pin
    # only the reserved-column guard and determinism of a re-run
    again = {r.k for r in out.collect()}
    assert again == {r.k for r in
                     temperature_domain_sample(
                         df, "k", "dom", "w", 0.5, 2000.0).collect()}
    import pytest

    with pytest.raises(ValueError, match="reserved"):
        temperature_domain_sample(
            df.withColumn("__sa", F.lit(1)), "k", "dom", "w", 0.5, 1.0
        )


def test_weighted_fixed_k_matches_python_reference(spark):
    """ES draw == python walk: rank by round(-ln((h+1)/2^60)/w, 6)
    with key tie-break, keep 3 per group."""
    import math

    from bigdatabowl2024_25_spark.operators.sampling import weighted_fixed_k

    rows = [(i, i % 4, float(i % 7 + 1)) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, g long, w double")
    got = {
        (r.g, r.k)
        for r in weighted_fixed_k(df, "k", "w", 3, group_col="g").collect()
    }

    def es_key(k, w):
        s = f"wsample:v1\x1f{k}".encode()
        h = int(hashlib.md5(s).hexdigest()[:15], 16)
        return round(-math.log((h + 1) / 16**15) / w, 6)

    want = set()
    for g in range(4):
        members = sorted(
            ((es_key(k, w), k) for k, gg, w in rows if gg == g),
        )[:3]
        want |= {(g, k) for _es, k in members}
    assert got == want


def test_weighted_fixed_k_prefers_heavy_weights(spark):
    """Across many independent seeds, heavy-weight rows must be drawn
    measurably more often than light ones (the ES inclusion bias)."""
    from bigdatabowl2024_25_spark.operators.sampling import weighted_fixed_k

    # half the keys weight 10, half weight 1
    df = spark.createDataFrame(
        [(i, 10.0 if i < 50 else 1.0) for i in range(100)],
        "k long, w double",
    )
    heavy = 0
    for s in range(20):
        picks = weighted_fixed_k(
            df, "k", "w", 5, seed=f"wtest:{s}"
        ).collect()
        heavy += sum(1 for r in picks if r.w == 10.0)
    # E[heavy share] ≈ 10/11 per pick; uniform would be 1/2 of 100
    assert heavy > 60  # out of 100 picks


def test_weighted_fixed_k_excludes_nonpositive_and_null(spark):
    from bigdatabowl2024_25_spark.operators.sampling import weighted_fixed_k

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -5.0), (4, None), (5, 2.0)],
        "k long, w double",
    )
    got = {r.k for r in weighted_fixed_k(df, "k", "w", 10).collect()}
    assert got == {1, 5}


def test_weighted_fixed_k_global_plan_is_take_ordered(spark):
    """The global path must be TakeOrderedAndProject (per-partition
    top-k + driver merge), never a global Sort."""
    from bigdatabowl2024_25_spark.operators.sampling import weighted_fixed_k

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 9 + 1).cast("double").alias("w")
    )
    plan = (
        weighted_fixed_k(df, "k", "w", 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_deterministic_shuffle_total_order_under_collision(spark):
    """Round-10 fix: the key column tie-breaks the 60-bit hash, so the
    permutation is a pure function of (seed, keys) even when two keys
    collide — verified by forcing a collision via duplicate keys and
    checking partition-layout invariance of the full output order."""
    rows = [(i % 40,) for i in range(200)]  # heavy duplicates = ties
    df = spark.createDataFrame(rows, "k bigint")
    a = [r.k for r in deterministic_shuffle(df.coalesce(1), "k").collect()]
    b = [
        r.k
        for r in deterministic_shuffle(df.repartition(13), "k").collect()
    ]
    assert a == b


def test_null_sampling_key_raises_everywhere(spark):
    """Round-10 audit: concat_ws skips NULLs inside tagged_hash64, so
    all NULL-key rows share ONE hash — membership silently correlates
    and tie-broken order goes partition-dependent. Every sampler must
    refuse NULL keys loudly."""
    import pytest

    from bigdatabowl2024_25_spark.operators.sampling import (
        hash_sample,
        stratified_fixed_k,
        temperature_domain_sample,
        token_budget_sample,
        weighted_domain_sample,
        weighted_fixed_k,
    )

    df = spark.createDataFrame(
        [(1, "a", 2.0), (None, "a", 3.0), (3, "b", 1.0)],
        "k bigint, dom string, w double",
    )
    ops = [
        lambda: hash_sample(df, "k", 0.5),
        lambda: weighted_domain_sample(df, "k", "dom", {"a": 1.0}),
        lambda: token_budget_sample(df, "k", "dom", "w", {"a": 10.0}),
        lambda: temperature_domain_sample(
            df, "k", "dom", "w", alpha=0.5, total_budget=10.0
        ),
        lambda: stratified_fixed_k(df, "k", "dom", 1),
        lambda: weighted_fixed_k(df, "k", "w", 1),
        lambda: deterministic_shuffle(df, "k"),
    ]
    for op in ops:
        with pytest.raises(Exception, match="NULL value in key column"):
            op().collect()


def test_weighted_fixed_k_nan_weight_never_sampled(spark):
    """NaN is GREATER than everything in Spark's ordering, so NaN
    passes `> 0`; it must be excluded like NULL/<=0 (no mass)."""
    from bigdatabowl2024_25_spark.operators.sampling import weighted_fixed_k

    df = spark.createDataFrame(
        [(1, float("nan")), (2, 5.0), (3, 1.0)], "k bigint, w double"
    )
    got = {r.k for r in weighted_fixed_k(df, "k", "w", 3).collect()}
    assert got == {2, 3}

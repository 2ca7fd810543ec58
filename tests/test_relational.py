

def test_salted_join_equals_plain_join_under_skew(spark):
    """Explicit key salting (round 11): membership must be EXACTLY the
    plain inner join on a deliberately hot key (one key owns 80% of
    the left side), the salt must appear in the join's shuffle keys
    (the whole point: the hot key spreads over n_salts reducers), the
    salt column must not leak into the output, and n_salts=1
    degenerates to the plain join."""
    from pyspark.sql import functions as F

    from bigdatabowl2024_25_spark.operators.relational import salted_join

    left = spark.range(1000).select(
        F.when(F.col("id") < 800, 7).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(60).select(
        (F.col("id") % 50).alias("k"), (F.col("id") * 10).alias("rval")
    )
    plain = sorted(
        map(tuple, left.join(right, ["k"]).select("k", "lval", "rval").collect())
    )
    for n in (1, 4):
        got = salted_join(left, right, ["k"], n_salts=n)
        assert got.columns == ["k", "lval", "rval"]  # no __salt leak
        assert sorted(map(tuple, got.collect())) == plain
    # the salt rides the shuffle key: hashpartitioning includes __salt
    plan = (
        salted_join(left, right, ["k"], n_salts=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__salt" in plan
    # guards
    import pytest

    with pytest.raises(ValueError, match="n_salts"):
        salted_join(left, right, ["k"], n_salts=0)
    with pytest.raises(ValueError, match="collide"):
        salted_join(left, left, ["k"])


def test_salted_join_spreads_exact_duplicate_rows(spark):
    """Round-12 ADVICE: a row-content-only salt sends EXACT-DUPLICATE
    rows on the hot key — a common shape of the skew this operator
    exists to fix — all to one salt, keeping the straggler. The salt
    mixes in a per-row positional id, so 1024 identical rows must
    spread across all n_salts buckets (P[missing any] ~ 8·(7/8)^1024 —
    never in practice), and membership/multiplicity must still equal
    the plain join (the salt is membership-independent)."""
    from pyspark.sql import functions as F

    from bigdatabowl2024_25_spark.operators.relational import (
        _left_salt,
        salted_join,
    )

    left = spark.range(1024).select(
        F.lit(7).alias("k"), F.lit("same").alias("lval")
    )
    n_salts = 8
    salts = {
        r.s
        for r in left.select(
            _left_salt(left.columns, n_salts).alias("s")
        ).collect()
    }
    assert salts == set(range(n_salts))
    right = spark.range(3).select(
        F.lit(7).alias("k"), F.col("id").alias("rval")
    )
    got = salted_join(left, right, ["k"], n_salts=n_salts)
    # 1024 identical left rows x 3 matches, multiplicity preserved
    assert got.count() == 1024 * 3
    assert sorted(map(tuple, got.distinct().collect())) == [
        (7, "same", 0),
        (7, "same", 1),
        (7, "same", 2),
    ]


def test_salted_join_null_keys_match_plain_join(spark):
    """Round-12 edge audit (VERDICT item 6): NULL join keys must drop
    on the salted path exactly as on the plain inner join (ANSI
    equi-join semantics) — xxhash64 over a NULL key still yields a
    valid salt, so the only acceptable behavior is membership
    equality, NULL rows excluded on both sides."""
    from pyspark.sql import functions as F

    from bigdatabowl2024_25_spark.operators.relational import salted_join

    left = spark.range(40).select(
        F.when(F.col("id") % 4 == 0, None)
        .otherwise(F.col("id") % 5)
        .alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.range(8).select(
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id") % 5)
        .alias("k"),
        (F.col("id") * 10).alias("rval"),
    )
    plain = sorted(
        map(
            tuple,
            left.join(right, ["k"]).select("k", "lval", "rval").collect(),
        )
    )
    assert plain  # non-degenerate fixture
    got = sorted(
        map(
            tuple,
            salted_join(left, right, ["k"], n_salts=4)
            .select("k", "lval", "rval")
            .collect(),
        )
    )
    assert got == plain
    # and no NULL key ever survives either path
    assert all(k is not None for k, _, _ in got)

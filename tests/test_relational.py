

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

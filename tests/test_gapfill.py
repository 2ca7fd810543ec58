"""time_bucket_gapfill semantics: grid synthesis, zero/locf/interp
fills, edges, partition invariance.

Parity query: q37 'gapfill' branch runs the operator over sparse
hourly buckets at sf0.01 against a generate_series + IGNORE NULLS
window oracle.
"""

from __future__ import annotations

from bigdatabowl2024_25_spark.operators.rollup import gapfill


def _series(spark):
    rows = [
        ("a", 0, 10.0, 2),
        ("a", 30, 40.0, 1),
        ("a", 40, 20.0, 3),
        ("b", 100, 7.0, 5),  # single observation: no gaps
    ]
    return spark.createDataFrame(
        rows, "k string, b bigint, v double, n bigint"
    )


def test_gapfill_policies(spark):
    out = gapfill(
        _series(spark),
        ["k"],
        "b",
        10,
        {"v": "interp", "n": "zero"},
    )
    got = {(r.k, r.b): (r.v, r.n, r.is_gap) for r in out.collect()}
    assert got == {
        ("a", 0): (10.0, 2, False),
        ("a", 10): (20.0, 0, True),  # interp 10→40 over 3 steps
        ("a", 20): (30.0, 0, True),
        ("a", 30): (40.0, 1, False),
        ("a", 40): (20.0, 3, False),
        ("b", 100): (7.0, 5, False),
    }
    # n stayed bigint, v stayed double
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["n"] == "bigint" and types["v"] == "double"


def test_gapfill_locf_and_edges(spark):
    rows = [("a", 10, None), ("a", 30, 5.0), ("a", 50, None)]
    df = spark.createDataFrame(rows, "k string, b bigint, v double")
    out = gapfill(df, ["k"], "b", 10, {"v": "locf"})
    got = {r.b: r.v for r in out.collect()}
    # leading NULL observation has nothing to carry; 30 onward carries 5
    assert got == {10: None, 20: None, 30: 5.0, 40: 5.0, 50: 5.0}

    out2 = gapfill(df, ["k"], "b", 10, {"v": "interp"})
    got2 = {r.b: r.v for r in out2.collect()}
    # single anchor: every bucket carries the nearest (only) value
    assert got2 == {10: 5.0, 20: 5.0, 30: 5.0, 40: 5.0, 50: 5.0}


def test_gapfill_partition_invariance(spark):
    df = _series(spark)
    a = gapfill(df, ["k"], "b", 10, {"v": "interp", "n": "zero"})
    b = gapfill(
        df.repartition(7), ["k"], "b", 10, {"v": "interp", "n": "zero"}
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_concurrency_profile_sweep(spark):
    from bigdatabowl2024_25_spark.operators.range_join import (
        concurrency_profile,
    )

    rows = [
        ("a", 0, 10),
        ("a", 5, 15),   # overlaps the first
        ("a", 10, 20),  # starts exactly as #1 ends: no double count
        ("b", 0, 100),
    ]
    df = spark.createDataFrame(rows, "k string, lo bigint, hi bigint")
    out = concurrency_profile(df, "lo", "hi", keys=["k"])
    got = {(r.k, r.ts): r.concurrency for r in out.collect()}
    assert got == {
        ("a", 0): 1,
        ("a", 5): 2,
        ("a", 10): 2,   # -1 (end of #1) +1 (start of #3)
        ("a", 15): 1,
        ("a", 20): 0,
        ("b", 0): 1,
        ("b", 100): 0,
    }
    # global profile (no keys) and max concurrency
    g = concurrency_profile(df, "lo", "hi")
    from pyspark.sql import functions as F

    assert g.agg(F.max("concurrency")).collect()[0][0] == 3


def test_rollup_delta_merge_equals_full_rebuild(spark):
    from pyspark.sql import functions as F

    from bigdatabowl2024_25_spark.operators.rollup import (
        rollup_delta_merge,
        time_bucket,
    )

    aggs = {
        "n": ("count", "v"),
        "s": ("sum", "v"),
        "mn": ("min", "v"),
        "mx": ("max", "v"),
    }
    day1 = spark.createDataFrame(
        [("a", 5, 10), ("a", 15, 20), ("b", 7, 7)], "k string, ts bigint, v bigint"
    )
    day2 = spark.createDataFrame(
        [("a", 8, 1), ("a", 95, 5), ("c", 3, 3)],  # old-bucket backfill + new key
        "k string, ts bigint, v bigint",
    )
    first = day1.groupBy(
        "k", time_bucket("ts", 10).alias("bucket_start")
    ).agg(
        F.count("v").alias("n"),
        F.sum("v").alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    merged = rollup_delta_merge(first, day2, ["k"], "ts", 10, aggs)
    rebuilt = day1.unionByName(day2).groupBy(
        "k", time_bucket("ts", 10).alias("bucket_start")
    ).agg(
        F.count("v").alias("n"),
        F.sum("v").alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_gapfill_observed_null_is_not_a_gap(spark):
    """Round-10 ADVICE fix: is_gap means ROW ABSENT. An observed
    bucket whose metric is legitimately NULL reports is_gap=False and
    is NOT zero-filled; locf/interp still bridge across it."""
    rows = [
        ("a", 0, 10.0, 2),
        ("a", 20, None, None),  # observed row, NULL metrics
        ("a", 40, 30.0, 4),
    ]
    df = spark.createDataFrame(rows, "k string, b bigint, v double, n bigint")
    out = gapfill(df, ["k"], "b", 10, {"v": "interp", "n": "zero"})
    got = {r.b: (r.v, r.n, r.is_gap) for r in out.collect()}
    assert got == {
        0: (10.0, 2, False),
        10: (15.0, 0, True),   # synthesized: interp + zero-fill
        20: (20.0, None, False),  # observed: NOT a gap, n stays NULL
        30: (25.0, 0, True),
        40: (30.0, 4, False),
    }


def test_concurrency_profile_null_and_inverted_bounds(spark):
    """Round-10 audit: a NULL boundary would sort first under the
    cumulative window and shift the whole profile. NULL hi = open
    interval (still-live session); NULL lo and hi<lo raise."""
    import pytest

    from bigdatabowl2024_25_spark.operators.range_join import (
        concurrency_profile,
    )

    open_iv = spark.createDataFrame(
        [(10, 20), (15, None), (18, 25)], "lo bigint, hi bigint"
    )
    got = {
        r.ts: r.concurrency
        for r in concurrency_profile(open_iv, "lo", "hi").collect()
    }
    # interval (15, None) stays live: +1 at 15 never decremented
    assert got == {10: 1, 15: 2, 18: 3, 20: 2, 25: 1}

    with pytest.raises(Exception, match="NULL lower bound"):
        concurrency_profile(
            spark.createDataFrame([(None, 20)], "lo bigint, hi bigint"),
            "lo",
            "hi",
        ).collect()
    with pytest.raises(Exception, match="ends before it starts"):
        concurrency_profile(
            spark.createDataFrame([(30, 20)], "lo bigint, hi bigint"),
            "lo",
            "hi",
        ).collect()

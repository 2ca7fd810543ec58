"""rolling_anomaly — integer-exact trailing z-score flag vs a python
reference, head/NULL semantics, and the one-exchange plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.windows import rolling_anomaly

N = 4
T = 2


def _ref_flags(series: list[float | None]) -> list[bool]:
    flags = []
    for i, v in enumerate(series):
        window = [x for x in series[max(0, i - N) : i] if x is not None]
        if v is None or len(window) < N or (i - N) < 0:
            flags.append(False)
            continue
        # exact integer rule on micro-units
        qs = [math.floor(x * 1_000_000) for x in window]
        q = math.floor(v * 1_000_000)
        c, s, ss = len(qs), sum(qs), sum(x * x for x in qs)
        flags.append((q * c - s) ** 2 > T * T * c * (c * ss - s * s))
    return flags


def test_rolling_anomaly_matches_reference(spark):
    series = [10.0, 10.2, 9.9, 10.1, 10.0, 50.0, 10.05, 9.95, 10.0, 10.1]
    rows = [(i, float(v)) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "i long, v double").withColumn(
        "u", F.lit(1)
    )
    got = [
        r.is_anomaly
        for r in rolling_anomaly(df, "v", ["u"], ["i"], n=N, t_num=T)
        .orderBy("i")
        .collect()
    ]
    assert got == _ref_flags(series)
    assert got[5] is True  # the planted spike
    assert not any(got[:N])  # head rows can't be judged


def test_rolling_anomaly_null_value_never_flagged(spark):
    series = [10.0, 10.1, 9.9, 10.0, None, 99.0, 9.9, 10.0, 10.1, 99.0]
    rows = [(i, v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "i long, v double").withColumn(
        "u", F.lit(1)
    )
    got = {
        r.i: r.is_anomaly
        for r in rolling_anomaly(df, "v", ["u"], ["i"], n=N, t_num=T)
        .collect()
    }
    assert got[4] is False  # NULL value: judged false, not NULL
    # the frame is POSITIONAL: row 5's trailing 4 rows include the NULL
    # row, so only 3 values are countable -> conservatively unflagged
    assert got[5] is False
    # row 9's frame (rows 5..8) is NULL-free but contains the 99 spike;
    # 99 vs mean ~32 is within 2 sigma of that wild window -> unflagged,
    # per the exact reference walk
    assert got[9] is _ref_flags(series)[9]


def test_rolling_anomaly_constant_series_never_flags(spark):
    """sigma = 0 and x == mu: the strict > must not fire (0 > 0)."""
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(20)], "i long, v double"
    ).withColumn("u", F.lit(1))
    got = rolling_anomaly(df, "v", ["u"], ["i"], n=N, t_num=T)
    assert not any(r.is_anomaly for r in got.collect())


def test_rolling_anomaly_single_exchange(spark):
    df = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(30)],
        "u long, i long, v double",
    )
    plan = (
        rolling_anomaly(df, "v", ["u"], ["i"], n=N)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan


def test_rolling_anomaly_overflow_raises_not_false(spark):
    """Round-10 ADVICE fix: a value whose micro-unit magnitude would
    overflow the decimal(38,0) cross-multiplication must FAIL the job,
    not silently come back 'not anomalous' via coalesce(NULL, False)."""
    import pytest

    huge = 1.0e22  # |q| ~ 1e28 >> the n=5 bound (~2.2e18)
    series = [10.0, 10.1, 9.9, 10.0, 10.2, huge, 10.0]
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(series)], "i long, v double"
    ).withColumn("u", F.lit(1))
    out = rolling_anomaly(df, "v", ["u"], ["i"], n=N, t_num=T)
    with pytest.raises(Exception, match="overflow-safe bound"):
        out.collect()


def test_rolling_anomaly_large_but_safe_values_ok(spark):
    """Values just inside the documented bound still evaluate exactly
    (the guard must not reject what the decimals can represent)."""
    big = 1.0e11  # q = 1e17, inside the n=5 bound
    series = [big, big, big, big, big, big * 1.5, big]
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(series)], "i long, v double"
    ).withColumn("u", F.lit(1))
    got = [
        r.is_anomaly
        for r in rolling_anomaly(df, "v", ["u"], ["i"], n=N, t_num=T)
        .orderBy("i")
        .collect()
    ]
    assert got[5] is True and got[6] is False


# ---- CUSUM drift flags ------------------------------------------------

def _ref_cusum(series, k, h, scale=1_000_000):
    """From-scratch RECURSIVE CUSUM (the textbook max(0, ...) form) —
    independent of the operator's prefix-sum/running-extrema identity."""
    import math

    s_up = s_dn = 0
    out = []
    for v in series:
        if v is None:
            out.append(None)
            continue
        q = math.floor(v * float(scale))
        d = q - k
        s_up = max(0, s_up + d)
        s_dn = max(0, s_dn - d)
        out.append("up" if s_up > h else ("down" if s_dn > h else None))
    return out


def test_cusum_matches_recursive_reference(spark):
    """The windowed identity S⁺ = P − min(0, min P) must equal the
    sequential recursion on mixed drift/spike/NULL series.

    Subtlety the test pins: a NULL pauses the series (zero deviation)
    without resetting state, and flags AFTER the alarm threshold stay
    raised (no-reset reporting semantics)."""
    import random

    from bigdatabowl2024_25_spark.operators.windows import cusum_flags

    rng = random.Random(77)
    for trial in range(5):
        series = []
        level = 1.0
        for i in range(60):
            if rng.random() < 0.05:
                series.append(None)
                continue
            if rng.random() < 0.08:
                level += rng.choice([-0.8, 0.8])  # genuine shift
            series.append(level + rng.uniform(-0.1, 0.1))
        rows = [(1, i, v) for i, v in enumerate(series)]
        df = spark.createDataFrame(rows, "k long, t long, v double")
        got = {
            r.t: r.cusum_flag
            for r in cusum_flags(
                df, "v", ["k"], ["t"],
                k_scaled=1_000_000, h_scaled=1_500_000,
            ).collect()
        }
        want = _ref_cusum(series, 1_000_000, 1_500_000)
        assert got == {i: f for i, f in enumerate(want)}, f"trial {trial}"


def test_cusum_partition_invariance_and_detection(spark):
    from bigdatabowl2024_25_spark.operators.windows import cusum_flags

    rows = [(u, i, 1.0 if i < 30 else 1.4) for u in (1, 2) for i in range(60)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    args = dict(k_scaled=1_100_000, h_scaled=2_000_000)
    a = sorted(
        (r.k, r.t, r.cusum_flag)
        for r in cusum_flags(df, "v", ["k"], ["t"], **args).collect()
    )
    b = sorted(
        (r.k, r.t, r.cusum_flag)
        for r in cusum_flags(
            df.repartition(13), "v", ["k"], ["t"], **args
        ).collect()
    )
    assert a == b
    flags = {(k, t): f for k, t, f in a}
    # the 1.0->1.4 shift at t=30 must raise 'up' within ~7 steps
    # (0.3 excess per step vs the 2.0 threshold) for both keys
    for u in (1, 2):
        assert flags[(u, 40)] == "up"
        assert flags[(u, 29)] in (None, "down")


def test_cusum_plan_single_shuffle(spark):
    """The identity must cost exactly ONE exchange (the keyed sort) —
    a second shuffle means the two window projections stopped sharing
    their partitioning."""
    import re

    from bigdatabowl2024_25_spark.operators.windows import cusum_flags

    df = spark.createDataFrame(
        [(1, 1, 1.0)], "k long, t long, v double"
    )
    plan = (
        cusum_flags(df, "v", ["k"], ["t"], k_scaled=1, h_scaled=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_cusum_all_null_series(spark):
    from bigdatabowl2024_25_spark.operators.windows import cusum_flags

    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, None)], "k long, t long, v double"
    )
    rows = cusum_flags(
        df, "v", ["k"], ["t"], k_scaled=1, h_scaled=1
    ).collect()
    assert all(r.cusum_flag is None for r in rows)

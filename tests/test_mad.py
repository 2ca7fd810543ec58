"""MAD outlier rule vs a from-scratch numpy reference (numpy's
interpolating median matches the exact-median A2 discipline)."""

from __future__ import annotations

import random

import numpy as np

from bigdatabowl2024_25_spark.operators.aggregates import mad_outliers


def test_mad_matches_numpy_reference(spark):
    rng = random.Random(5)
    rows = []
    for k in (1, 2):
        for i in range(41 + k):  # odd AND even group sizes
            v = rng.gauss(10.0 * k, 1.0)
            if rng.random() < 0.1:
                v += rng.choice([-25.0, 40.0])  # planted outliers
            rows.append((k, i, v))
    df = spark.createDataFrame(rows, "k long, i long, v double")
    got = {
        (r.k, r.i): (r.is_mad_outlier, r["__med"], r["__mad"])
        for r in mad_outliers(df, ["k"], "v", c_num=3).collect()
    }
    for k in (1, 2):
        vals = np.array([v for kk, _, v in rows if kk == k])
        med = float(np.median(vals))
        mad = float(np.median(np.abs(vals - med)))
        for kk, i, v in rows:
            if kk != k:
                continue
            flag, gmed, gmad = got[(k, i)]
            assert gmed == med and gmad == mad
            assert flag == (abs(v - med) * 1 > 3 * mad)
    assert any(f for f, _, _ in got.values())
    assert not all(f for f, _, _ in got.values())


def test_mad_null_values_unflagged(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (1, 3.0), (1, None), (1, 100.0)],
        "k long, v double",
    )
    rows = mad_outliers(df, ["k"], "v").collect()
    by_v = {r.v: r.is_mad_outlier for r in rows}
    # NULL value -> NULL flag (never silently outlier or inlier)
    assert by_v[None] is None
    assert by_v[100.0] is True and by_v[2.0] is False


def test_mad_null_key_rows_survive(spark):
    """NULL-keyed rows form their own group (groupBy semantics) and
    must come back FLAGGED, not vanish: the stats joins are null-safe
    (eqNullSafe), so the NULL group's median/MAD match back onto its
    rows exactly like any other key's (the r10-ADVICE rows-vanishing
    defect)."""
    df = spark.createDataFrame(
        [(None, 1.0), (None, 1.0), (None, 1.0), (None, 50.0),
         (1, 2.0), (1, 2.0), (1, 2.0)],
        "k bigint, v double",
    )
    rows = mad_outliers(df, ["k"], "v").collect()
    assert len(rows) == 7  # nothing dropped
    null_grp = [(r.v, r.is_mad_outlier) for r in rows if r.k is None]
    assert sorted(null_grp) == [
        (1.0, False), (1.0, False), (1.0, False), (50.0, True)
    ]


def test_mad_zero_mad_degenerate(spark):
    """MAD = 0 (majority identical): the rule degenerates to 'any
    deviation is an outlier' — the textbook behavior, pinned so a
    future epsilon guard can't silently change it."""
    df = spark.createDataFrame(
        [(1, 5.0), (1, 5.0), (1, 5.0), (1, 5.1)], "k long, v double"
    )
    got = {r.v: r.is_mad_outlier for r in mad_outliers(df, ["k"], "v").collect()}
    assert got[5.0] is False and got[5.1] is True

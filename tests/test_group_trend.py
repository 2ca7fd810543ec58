"""group_trend vs a from-scratch integer least-squares reference."""

from __future__ import annotations

import math
import random

from bigdatabowl2024_25_spark.operators.aggregates import group_trend


def _ref_slope(points, scale=1_000_000):
    """points: [(ts_us, value|None)] → truncated micro-slope or None.
    Python // floors, so the truncation is spelled out (Spark div and
    DuckDB // truncate toward zero)."""
    pts = [
        (ts // 1_000_000, math.floor(v * float(scale)))
        for ts, v in points
        if v is not None
    ]
    if not pts:
        return None, 0
    x0 = min(t for t, _ in pts)
    xs = [t - x0 for t, _ in pts]
    ys = [y for _, y in pts]
    n = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    if den <= 0:
        return None, n
    num = n * sxy - sx * sy
    q = abs(num) // den
    return (q if num >= 0 else -q), n


def test_group_trend_matches_reference(spark):
    rng = random.Random(9)
    rows = []
    for k in range(1, 6):
        base = rng.uniform(1, 50)
        slope = rng.choice([-2.5, -0.1, 0.0, 0.3, 4.0])
        for i in range(rng.randint(2, 25)):
            ts = i * rng.randint(1, 3) * 1_000_000 + rng.randint(0, 999_999)
            v = base + slope * (ts / 1e6) + rng.uniform(-0.01, 0.01)
            if rng.random() < 0.1:
                v = None
            rows.append((k, ts, v))
    rows.append((9, 5_000_000, 1.0))           # single point
    rows.append((10, 5_000_000, 1.0))          # zero x-variance pair
    rows.append((10, 5_400_000, 2.0))          # (same second)
    df = spark.createDataFrame(rows, "k long, ts_us long, v double")
    got = {
        r.k: (r.slope_micro, r.n)
        for r in group_trend(df, ["k"], "ts_us", "v").collect()
    }
    for k in sorted({r[0] for r in rows}):
        pts = [(ts, v) for kk, ts, v in rows if kk == k]
        slope, n = _ref_slope(pts)
        assert got[k] == (slope, n), (k, got[k], (slope, n))
    # negative-slope truncation direction explicitly pinned
    assert any(s is not None and s < 0 for s, _ in got.values())
    # degenerate keys: NULL slope, not a crash or a zero
    assert got[9][0] is None and got[10][0] is None


def test_group_trend_null_ts_excluded_from_fit(spark):
    """A NULL-timestamp row with a non-NULL value must be excluded
    from BOTH n and the moment sums (r10-ADVICE defect: it used to
    pass the y-filter, inflate n, and skip the x sums — a silently
    wrong slope). The key's slope must equal the fit over its valid
    rows alone."""
    rows = [(1, i * 1_000_000, 2.0 * i) for i in range(10)]
    df_clean = spark.createDataFrame(rows, "k long, ts_us long, v double")
    want = {(r.k, r.slope_micro, r.n)
            for r in group_trend(df_clean, ["k"], "ts_us", "v").collect()}
    dirty = rows + [(1, None, 999.0), (1, None, -999.0)]
    df_dirty = spark.createDataFrame(dirty, "k long, ts_us bigint, v double")
    got = {(r.k, r.slope_micro, r.n)
           for r in group_trend(df_dirty, ["k"], "ts_us", "v").collect()}
    assert got == want
    assert next(iter(got))[2] == 10  # n counts only fitted rows


def test_group_trend_partition_invariance(spark):
    rows = [(1, i * 1_000_000, float(i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, ts_us long, v double")
    a = group_trend(df, ["k"], "ts_us", "v").collect()
    b = group_trend(df.repartition(11), ["k"], "ts_us", "v").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

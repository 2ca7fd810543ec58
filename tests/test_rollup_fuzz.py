"""Hypothesis fuzz of gapfill and concurrency_profile against
brute-force pure-Python references — adversarial sparse/dense/tied
layouts the q37/q36 oracles' manufactured series don't reach
(single-bucket keys, all-gap interiors, observed NULLs in every
position, zero-length and duplicate intervals).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdatabowl2024_25_spark.operators.range_join import (
    concurrency_profile,
)
from bigdatabowl2024_25_spark.operators.rollup import gapfill

_W = 10
_BUCKET = st.integers(0, 6).map(lambda b: b * _W)
_VAL = st.one_of(st.none(), st.integers(-5, 5).map(float))


def _ref_gapfill(rows):
    """rows: [(bucket, v)] one key; returns {bucket: (v_interp, n_zero,
    is_gap)} under the operator's documented semantics."""
    if not rows:
        return {}
    obs = dict(rows)
    lo, hi = min(obs), max(obs)
    grid = list(range(lo, hi + 1, _W))
    anchors = [(b, v) for b, v in sorted(obs.items()) if v is not None]
    out = {}
    for b in grid:
        present = b in obs
        v = obs.get(b)
        if v is None:
            pv = max(((ab, av) for ab, av in anchors if ab <= b), default=None)
            nv = min(((ab, av) for ab, av in anchors if ab >= b), default=None)
            if pv is None and nv is None:
                v = None
            elif pv is None:
                v = nv[1]
            elif nv is None:
                v = pv[1]
            else:
                frac = float(b - pv[0]) / float(nv[0] - pv[0])
                v = pv[1] + (nv[1] - pv[1]) * frac
        n = 0 if not present else None
        out[b] = (v, n, not present)
    return out


@pytest.mark.slow
@settings(max_examples=20, deadline=None)
@given(
    rows=st.lists(st.tuples(_BUCKET, _VAL), min_size=1, max_size=8)
)
def test_gapfill_matches_python_reference(spark, rows):
    # one row per bucket (the operator's input contract: bucketed data)
    dedup = {}
    for b, v in rows:
        dedup.setdefault(b, v)
    rows = sorted(dedup.items())
    df = spark.createDataFrame(
        [("k", b, v, None if v is None else 0) for b, v in rows],
        "k string, b bigint, v double, n bigint",
    )
    # n mirrors v's NULL-ness so 'zero' sees observed NULLs too
    out = gapfill(df, ["k"], "b", _W, {"v": "interp", "n": "zero"})
    got = {r.b: (r.v, r.n, r.is_gap) for r in out.collect()}
    want = _ref_gapfill(rows)
    assert set(got) == set(want)
    for b in want:
        wv, wn, wg = want[b]
        gv, gn, gg = got[b]
        assert gg == wg, (b, got[b], want[b])
        assert gn == (0 if wg else (None if rows_v_null(rows, b) else 0)), b
        if wv is None:
            assert gv is None, b
        else:
            assert gv == pytest.approx(wv, abs=0.0), b


def rows_v_null(rows, b):
    return dict(rows)[b] is None


def _ref_concurrency(intervals):
    deltas = {}
    for lo, hi in intervals:
        deltas[lo] = deltas.get(lo, 0) + 1
        if hi is not None:
            deltas[hi] = deltas.get(hi, 0) - 1
    out, run = {}, 0
    for ts in sorted(deltas):
        run += deltas[ts]
        out[ts] = run
    return out


@pytest.mark.slow
@settings(max_examples=20, deadline=None)
@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 20), st.one_of(st.none(), st.integers(0, 20))),
        min_size=1,
        max_size=10,
    ).map(
        lambda ivs: [
            (lo, hi if hi is None or hi >= lo else lo + (lo - hi))
            for lo, hi in ivs
        ]
    )
)
def test_concurrency_matches_python_reference(spark, intervals):
    df = spark.createDataFrame(intervals, "lo bigint, hi bigint")
    got = {
        r.ts: r.concurrency
        for r in concurrency_profile(df, "lo", "hi").collect()
    }
    assert got == _ref_concurrency(intervals)


@pytest.mark.slow
@settings(max_examples=20, deadline=None)
@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=12,
    ).map(
        lambda ivs: [
            (k, min(lo, hi), max(lo, hi)) for k, lo, hi in ivs
        ]
    )
)
def test_interval_coverage_matches_brute_force(spark, intervals):
    """Covered length per key == brute-force union of integer points
    (half-open [lo, hi)); zero-length intervals contribute nothing;
    max_concurrency == brute-force peak overlap."""
    from bigdatabowl2024_25_spark.operators.range_join import (
        interval_coverage,
    )

    df = spark.createDataFrame(intervals, "k bigint, lo bigint, hi bigint")
    got = {
        r.k: (r.covered, r.max_concurrency)
        for r in interval_coverage(df, "lo", "hi", keys=["k"]).collect()
    }
    want = {}
    for k in {iv[0] for iv in intervals}:
        pts = set()
        for kk, lo, hi in intervals:
            if kk == k:
                pts.update(range(lo, hi))
        peak = max(
            (
                sum(
                    1
                    for kk, lo, hi in intervals
                    if kk == k and lo <= t < hi
                )
                for t in pts
            ),
            default=0,
        )
        # the profile's max includes zero-length boundary rows, so
        # peak can legitimately be 0 only when ALL intervals are empty
        want[k] = (len(pts), peak)
    # max_concurrency: empty intervals still emit boundary rows with
    # count 0 after their +1/-1 collapse -> compare covered exactly,
    # peak only when some interval is non-empty
    for k, (cov, peak) in want.items():
        assert got[k][0] == cov
        if peak > 0:
            assert got[k][1] == peak


def test_interval_coverage_rejects_open_intervals(spark):
    import pytest as _pytest

    from bigdatabowl2024_25_spark.operators.range_join import (
        interval_coverage,
    )

    df = spark.createDataFrame(
        [(1, 5, None)], "k bigint, lo bigint, hi bigint"
    )
    with _pytest.raises(Exception, match="interval_coverage"):
        interval_coverage(df, "lo", "hi", keys=["k"]).collect()


def test_interval_coverage_global(spark):
    """keys=None: one global row; overlapping intervals never
    double-count."""
    from bigdatabowl2024_25_spark.operators.range_join import (
        interval_coverage,
    )

    df = spark.createDataFrame(
        [(0, 10), (5, 15), (20, 25), (22, 22)], "lo bigint, hi bigint"
    )
    row = interval_coverage(df, "lo", "hi").collect()[0]
    assert row.covered == 20 and row.max_concurrency == 2

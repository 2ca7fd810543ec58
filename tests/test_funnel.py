"""Funnel + cohort retention semantics on hand-built event logs.

Parity queries: q43 'funnel' branch and q42 'cohort' branch re-derive
both operators in DuckDB SQL over events at sf0.01.
"""

from __future__ import annotations

from bigdatabowl2024_25_spark.operators.funnel import (
    cohort_retention,
    funnel_steps,
)

EVENTS = [
    # u1: full funnel in order
    (1, 10, "view"), (1, 20, "cart"), (1, 30, "buy"),
    # u2: cart BEFORE the first view — doesn't count; no buy
    (2, 5, "cart"), (2, 10, "view"), (2, 40, "cart"),
    # u3: view only
    (3, 7, "view"),
    # u4: everything at once but strictly ordered same-ts ties broken
    # by strict > (cart at the same ts as view does NOT advance)
    (4, 10, "view"), (4, 10, "cart"), (4, 11, "cart"), (4, 12, "buy"),
    # u5: no view at all — not in the funnel
    (5, 10, "buy"),
]


def _df(spark):
    return spark.createDataFrame(
        EVENTS, "user_id bigint, ts bigint, ty string"
    )


def test_funnel_fates(spark):
    out = funnel_steps(_df(spark), "user_id", "ts", "ty", ["view", "cart", "buy"])
    got = {r.user_id: (r.t0, r.t1, r.t2, r.reached) for r in out.collect()}
    assert got == {
        1: (10, 20, 30, 3),
        2: (10, 40, None, 2),  # the ts=5 cart precedes the view
        3: (7, None, None, 1),
        4: (10, 11, 12, 3),  # same-ts cart skipped (strict >)
    }
    assert 5 not in got


def test_funnel_within_window(spark):
    out = funnel_steps(
        _df(spark), "user_id", "ts", "ty", ["view", "cart", "buy"], within=5
    )
    got = {r.user_id: r.reached for r in out.collect()}
    # u1's cart at +10 is outside the 5-tick window; u4 fits entirely
    assert got[1] == 1 and got[4] == 3


def test_cohort_retention_triangle(spark):
    rows = [
        (1, 0), (1, 10), (1, 25),   # cohort 0, active k=0,1,2
        (2, 5), (2, 27),            # cohort 0, active k=0,2
        (3, 13),                    # cohort 1, k=0 only
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts bigint")
    out = cohort_retention(df, "user_id", "ts", 10)
    got = {(r.cohort, r.k): r.n_users for r in out.collect()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 2, (1, 0): 1}


def test_funnel_partition_invariance(spark):
    df = _df(spark)
    a = funnel_steps(df, "user_id", "ts", "ty", ["view", "cart", "buy"])
    b = funnel_steps(
        df.repartition(7), "user_id", "ts", "ty", ["view", "cart", "buy"]
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

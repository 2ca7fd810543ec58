"""Data-quality expectations: every family, single-pass plan shape.

Parity query: q95 'expect' branch re-derives the violation counts in
SQL over manufactured dirty data at sf0.01.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.sources.quality import enforce, expect


def _dirty(spark):
    rows = [
        (1, "a@x.com", "A", 10.0, 1),
        (2, None, "A", -5.0, 1),        # null email, range violation
        (3, "nope", "C", 20.0, 2),      # bad pattern, bad status
        (3, "b@x.com", "B", 30.0, 9),   # dup id, orphan fk
        (4, "c@x.com", "B", None, 1),   # null bal: range ignores nulls
    ]
    return spark.createDataFrame(
        rows, "id bigint, email string, status string, bal double, nid int"
    )


def _dim(spark):
    return spark.createDataFrame([(1,), (2,)], "n_id int")


def test_expect_counts_every_family(spark):
    rep = expect(
        _dirty(spark),
        not_null=["email", "bal"],
        accepted_values={"status": ["A", "B"]},
        in_range={"bal": (0.0, 100.0)},
        matches={"email": "@"},
        unique=[["id"]],
        foreign_key={"nid": (_dim(spark), "n_id")},
    )
    got = {(r.expectation, r.column): r.n_violations for r in rep.collect()}
    assert got == {
        ("not_null", "email"): 1,
        ("not_null", "bal"): 1,
        ("accepted_values", "status"): 1,
        ("in_range", "bal"): 1,
        ("matches", "email"): 1,
        ("unique", "id"): 1,
        ("foreign_key", "nid"): 1,
    }
    with pytest.raises(ValueError, match="unique\\(id\\)=1"):
        enforce(rep)


def test_expect_clean_data_passes_and_single_pass_plan(spark):
    df = spark.createDataFrame(
        [(1, "a@x.com", "A", 1.0, 1)],
        "id bigint, email string, status string, bal double, nid int",
    )
    rep = expect(
        df,
        not_null=["email"],
        accepted_values={"status": ["A"]},
        in_range={"bal": (0.0, 2.0)},
        matches={"email": "@"},
    )
    enforce(rep)  # no raise
    # all four row-level expectations ride ONE aggregate over ONE scan
    sc = df.sparkSession.sparkContext
    plan = sc._jvm.PythonSQLUtils.explainString(
        rep._jdf.queryExecution(), "formatted"
    )
    assert len(re.findall(r"\(\d+\) Scan", plan)) == 1
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) == 2  # partial+final

"""Scalar-layer unit tests for functions with no testdata column to
oracle-check (F7 timestamp pad+parse) and edge semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.functions.scalar import (
    clock_to_seconds,
    coalesce_nearest,
    pad_time_fraction,
    seconds_to_clock,
)


def test_pad_time_fraction_variable_digits(spark):
    """F7: `pad_time_fraction` right-pads the fraction to 6 digits then
    parses; unparseable → null (pandas errors='coerce',
    `DefPosModel.ipynb` cell 1)."""
    rows = [
        ("2022-09-08 20:00:10",),          # no fraction
        ("2022-09-08 20:00:10.5",),        # 1 digit → 500000 µs
        ("2022-09-08 20:00:10.123",),      # 3 digits → 123000 µs
        ("2022-09-08 20:00:10.123456",),   # full
        ("garbage",),                      # coerce → null
    ]
    df = spark.createDataFrame(rows, "time string")
    out = [r.ts for r in df.select(pad_time_fraction(F.col("time")).alias("ts")).collect()]
    assert out[0] == datetime.datetime(2022, 9, 8, 20, 0, 10)
    assert out[1] == datetime.datetime(2022, 9, 8, 20, 0, 10, 500000)
    assert out[2] == datetime.datetime(2022, 9, 8, 20, 0, 10, 123000)
    assert out[3] == datetime.datetime(2022, 9, 8, 20, 0, 10, 123456)
    assert out[4] is None


def test_pad_time_fraction_on_fixture_times(spark):
    from tests.fixtures_bdb import build_fixtures

    t = build_fixtures(spark, n_games=1, plays_per_game=1)["tracking"]
    parsed = t.select(pad_time_fraction(F.col("time")).alias("ts"))
    assert parsed.filter(F.col("ts").isNull()).count() == 0
    # 10 Hz: consecutive frames are 100 ms apart in the generator's
    # encoding (frame % 10 tenths)
    assert parsed.distinct().count() == 40


def test_clock_roundtrip(spark):
    df = spark.createDataFrame([(754,), (59,), (0,)], "sec int")
    out = df.select(
        seconds_to_clock(F.col("sec")).alias("clock")
    ).select(
        "clock", clock_to_seconds(F.col("clock")).alias("back")
    ).collect()
    assert [r.clock for r in out] == ["12:34", "0:59", "0:00"]
    assert [r.back for r in out] == [754, 59, 0]


def test_coalesce_nearest_prefers_close_then_left(spark):
    df = spark.createDataFrame(
        [(None, None, 3.0, 4.0, 5.0)], "a double, b double, c double, d double, e double"
    )
    cols = ["a", "b", "c", "d", "e"]
    out = df.select(
        coalesce_nearest(cols, 0).alias("f0"),  # a null → b null → c
        coalesce_nearest(cols, 3).alias("f3"),  # d present
        coalesce_nearest(cols, 1).alias("f1"),  # b null → ties (a,c): a null → c
    ).first()
    assert out.f0 == 3.0
    assert out.f3 == 4.0
    assert out.f1 == 3.0

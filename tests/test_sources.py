"""Source/sink layer (S1-S7): schema-declared CSV glob scans, parquet
writers, key assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatabowl2024_25_spark import schemas
from bigdatabowl2024_25_spark.sources import io
from tests.fixtures_bdb import build_fixtures


def test_csv_glob_scan_replaces_append_loop(spark, tmp_path):
    """S1/S2: the reference's 9-file read→append loop
    (`DatabaseCreation.R:32-36`) is one globbed scan with a declared
    schema."""
    t = build_fixtures(spark, n_games=2, plays_per_game=1)["tracking"]
    for g in (0, 1):
        t.filter(F.col("gameId") == 2022090800 + g).write.mode(
            "overwrite"
        ).option("header", True).csv(str(tmp_path / f"tracking_week_{g + 1}"))

    back = io.read_csv(
        spark, str(tmp_path / "tracking_week_*"), schemas.TRACKING
    )
    assert back.count() == t.count()
    # CSV sources force nullable=True; names and types must match
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in schemas.TRACKING.fields
    ]
    assert back.select("gameId").distinct().count() == 2


def test_csv_failfast_on_bad_schema(spark, tmp_path):
    (tmp_path / "bad.csv").write_text("gameId,playId\nnot_a_number,1\n")
    df = io.read_csv(
        spark,
        str(tmp_path / "bad.csv"),
        schemas.GAMES,
    )
    with pytest.raises(Exception):
        df.collect()


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    """S3: stage-table sink with partition layout (the 100 TB tracking
    table partitions by gameId/week so play-local reads prune)."""
    t = build_fixtures(spark, n_games=2, plays_per_game=1)["tracking"]
    path = str(tmp_path / "tracking_parquet")
    io.write_table(t, path, partition_by=["gameId"])
    back = spark.read.parquet(path)
    assert back.count() == t.count()
    # partition pruning: a gameId filter scans one partition directory
    plan = back.filter(F.col("gameId") == 2022090800)._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan


def test_csv_sink(spark, tmp_path):
    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    io.write_csv(df, str(tmp_path / "out"), single_file=True)
    back = spark.read.option("header", True).csv(str(tmp_path / "out"))
    assert back.count() == 10


def test_assert_unique_key_raises(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string")
    with pytest.raises(ValueError):
        io.assert_unique_key(df, ["k"])


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Bucketed co-location: two facts bucketed on the same key join
    with ZERO shuffle exchanges — the write-once pre-shuffle that makes
    repeated 100 TB fact⋈fact joins (SURVEY §2.3 J10) affordable."""
    import re

    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    io.write_bucketed(a, "bkt_a", ["k"], 4)
    io.write_bucketed(b, "bkt_b", ["k"], 4)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"Exchange hashpartitioning", plan), plan
        assert joined.count() == 1000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")

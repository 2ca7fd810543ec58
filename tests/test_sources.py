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


def test_events_ts_drift_tolerance(spark, tmp_path):
    """Schema-drift-proof events ingestion (the round-4 lesson): the
    loader must yield bit-identical ``ts_us`` whether the generator
    wrote ``ts`` as parquet timestamp[us] (NTZ), timestamp[us, tz=UTC]
    (LTZ), or legacy INT64 TIMESTAMP(NANOS) — and independently of the
    Spark session timezone. Mirrors the reference's
    infer-at-every-boundary resilience (SURVEY §1.4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    micros = [1704067798778549, 1706657176220708, 0, 1234567890123456]
    ids = list(range(len(micros)))

    def write(dirname, arr):
        d = tmp_path / dirname
        d.mkdir()
        pq.write_table(
            pa.table({"event_id": pa.array(ids, pa.int64()), "ts": arr}),
            str(d / "events.parquet"),
            version="2.6",
        )
        return str(d)

    ntz = write("ntz", pa.array(micros, pa.timestamp("us")))
    ltz = write("ltz", pa.array(micros, pa.timestamp("us", tz="UTC")))
    nanos = write(
        "nanos", pa.array([m * 1000 for m in micros], pa.timestamp("ns"))
    )

    prior_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        # a non-UTC session tz must not perturb ts_us on any branch
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        results = {}
        for label, path in [("ntz", ntz), ("ltz", ltz), ("nanos", nanos)]:
            df = io.load_table(spark, path, "events")
            assert dict(df.dtypes)["ts_us"] == "bigint"
            assert dict(df.dtypes)["ts"] == "timestamp"
            results[label] = [
                r.ts_us for r in df.orderBy("event_id").select("ts_us").collect()
            ]
        assert results["ntz"] == micros
        assert results["ltz"] == micros
        assert results["nanos"] == micros
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior_tz)


def test_jsonl_roundtrip_and_corrupt_lines(spark, tmp_path):
    """JSONL sink/source roundtrip is lossless, and malformed lines
    land in the corrupt-record column instead of failing the scan or
    silently vanishing (PERMISSIVE contract at corpus scale)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bigdatabowl2024_25_spark.sources.io import read_jsonl, write_jsonl

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(50)], schema
    )
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(df, path)
    # cache: corrupt-column-only queries on a raw scan are refused
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    back = read_jsonl(spark, f"{path}/part-*.json", schema).cache()
    assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
    assert sorted(
        (r.doc_id, r.text) for r in back.drop("_corrupt_record").collect()
    ) == sorted((r.doc_id, r.text) for r in df.collect())

    # hand-write a file with a broken line in the middle
    bad = tmp_path / "mixed.json"
    bad.write_text(
        '{"doc_id": 1, "text": "ok one"}\n'
        "{not json at all\n"
        '{"doc_id": 2, "text": "ok two"}\n'
    )
    got = read_jsonl(spark, str(bad), schema).cache()
    assert got.count() == 3
    corrupt = got.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(corrupt) == 1 and "not json" in corrupt[0]._corrupt_record
    assert {
        r.doc_id for r in got.filter(F.col("_corrupt_record").isNull()).collect()
    } == {1, 2}


def test_read_jsonl_schema_already_has_corrupt_col(spark, tmp_path):
    """Re-ingesting a quarantine output whose schema already carries
    the corrupt column must not create a duplicate field."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bigdatabowl2024_25_spark.sources.io import read_jsonl

    f = tmp_path / "one.json"
    f.write_text('{"doc_id": 7, "text": "kept"}\n')
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    got = read_jsonl(spark, str(f), schema)
    assert got.schema.fieldNames().count("_corrupt_record") == 1
    assert got.count() == 1


def test_binary_payload_parquet_roundtrip(spark, tmp_path):
    """Round 13: binary-column parquet IO is byte-exact — the media
    pipeline's storage contract. Payloads include non-UTF8 bytes, all
    256 byte values, empty bytes, NULL, and a real codec output;
    write_table partition-parallel, re-read, compare bytes."""
    import numpy as np

    from bigdatabowl2024_25_spark.operators.media_av import (
        encode_wav_ima_adpcm,
    )
    from bigdatabowl2024_25_spark.sources.io import write_table

    payloads = [
        (0, bytes(range(256))),
        (1, b"\xff\xfe\x00\x01ab"),
        (2, b""),
        (3, None),
        (4, encode_wav_ima_adpcm(
            (np.arange(100) % 97).astype(np.int16) * 100, 8000
        )),
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    path = str(tmp_path / "blobs")
    write_table(df, path)
    back = {
        r.media_id: (None if r.payload is None else bytes(r.payload))
        for r in spark.read.parquet(path).collect()
    }
    assert back == dict(payloads)


def test_binary_files_ingest(spark, tmp_path):
    """Round 13: the media-ingest source — one row per file, content
    byte-exact (non-UTF8 bytes included), pathGlobFilter prunes
    non-matching files without opening them, and the max_bytes guard
    rejects oversized blobs loudly instead of OOMing a task."""
    from bigdatabowl2024_25_spark.sources.io import read_binary_files

    d = tmp_path / "media"
    d.mkdir()
    blobs = {
        "a.bin": bytes(range(256)),
        "b.bin": b"\xff\x00small",
        "c.txt": b"not matched by the glob",
    }
    for name, data in blobs.items():
        (d / name).write_bytes(data)

    df = read_binary_files(spark, str(d), glob_filter="*.bin")
    got = {
        r.path.rsplit("/", 1)[-1]: (bytes(r.content), r.length)
        for r in df.collect()
    }
    assert set(got) == {"a.bin", "b.bin"}
    for name in got:
        assert got[name] == (blobs[name], len(blobs[name]))

    # byte-bound guard: the big file trips it EAGERLY (content-free
    # status probe -> ValueError at call time, before any blob reads)
    with pytest.raises(ValueError, match="max_bytes"):
        read_binary_files(
            spark, str(d), glob_filter="*.bin", max_bytes=100
        )
    # bound above every file: clean pass-through
    ok = read_binary_files(
        spark, str(d), glob_filter="*.bin", max_bytes=10_000
    )
    assert ok.count() == 2


def test_text_files_ingest(spark, tmp_path):
    """Round 13: the raw-corpus ingest source — wholetext=True reads
    one DOCUMENT per file (the raw LLM-corpus layout), wholetext=False
    one row per line; multi-line documents survive byte-exactly."""
    from bigdatabowl2024_25_spark.sources.io import read_text_files

    d = tmp_path / "corpus"
    d.mkdir()
    docs = {
        "doc1.txt": "first document\nwith two lines",
        "doc2.txt": "second document",
    }
    for name, text in docs.items():
        (d / name).write_text(text)

    whole = read_text_files(spark, str(d / "*.txt"))
    assert sorted(r.value for r in whole.collect()) == sorted(
        docs.values()
    )
    lines = read_text_files(spark, str(d / "*.txt"), wholetext=False)
    assert lines.count() == 3

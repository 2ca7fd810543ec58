"""Sources & sinks (SURVEY.md §2.1, S1-S7).

The reference ingests CSVs with inferred schemas into SQLite
(`DatabaseCreation.R:14-56`: per-file read_csv loop + 300k-row
transactional chunks) and links pipeline stages through SQLite tables.
Spark-first replacements:

- S1/S2: one globbed `spark.read` with an *explicit* schema — the 9-file
  append loop (`DatabaseCreation.R:32-36`) collapses into a single scan;
  schema inference (two passes over 59M rows) is eliminated.
- S3/S4: `df.write.mode(...)` — partition-parallel, no manual chunking
  or transactions.
- S5: `spark.sql` over registered views — lazy, never a blocking
  full-result fetch like `dbFetch(res, -1)`
  (`Openness_Data_Frame_Prep.R:17`).
- S7 (PK/FK DDL, non-functional in SQLite): `assert_unique_key` turns
  the intended constraints into cheap verifiable invariants.

Scale notes: parquet scans get column pruning + predicate pushdown from
Catalyst for free; writers default to snappy parquet partitioned by a
caller-chosen key (week/gameId for tracking at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: tables the driver materializes under /root/testdata/sf*/
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: epoch anchor for tz-free NTZ → microsecond conversion
_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Schema-drift-tolerant ``ts`` normalization for the events table.

    The reference infers schemas at every ingestion boundary
    (`DatabaseCreation.R:14-56` read_csv + dbWriteTable affinities,
    SURVEY §1.4) and so survives upstream type changes; this is the
    Spark analog. Whatever physical encoding the parquet carries, we
    derive the same two canonical columns:

    - ``ts_us``: epoch microseconds (long). Exact integer arithmetic
      on every branch — never a double divide (nanos exceed 2^53 and
      would round). Equals DuckDB's ``epoch_us(ts)`` bit-for-bit and
      is timezone-independent, so parity queries project it, never raw
      ``ts``.
    - ``ts``: TIMESTAMP via timestamp_micros, for event-time /
      streaming use.

    Branches by the *loaded* Spark dtype of ``ts``:

    - ``bigint`` — legacy INT64 TIMESTAMP(NANOS) read via
      ``nanosAsLong``: integer ``div 1000``.
    - ``timestamp_ntz`` — parquet ``timestamp[us]`` (isAdjustedToUTC =
      false): ``timestampdiff(MICROSECOND, epoch, ts)``, computed
      wholly in the NTZ domain, never touches the session timezone.
    - ``timestamp`` (LTZ) — parquet ``timestamp[us, tz=UTC]``:
      ``unix_micros(ts)``, which is epoch micros by definition and
      likewise session-tz-free.
    """
    t = dict(df.dtypes)["ts"]
    if t == "bigint":
        ts_us = F.expr("ts div 1000")
    elif t == "timestamp_ntz":
        ts_us = F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, ts)")
    elif t == "timestamp":
        ts_us = F.unix_micros(F.col("ts"))
    else:
        raise TypeError(
            f"events.ts loaded as unsupported dtype {t!r}; expected "
            "bigint (legacy nanos), timestamp_ntz, or timestamp"
        )
    return df.withColumn("ts_us", ts_us).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one synthetic table (S1).

    ``events`` gets drift-tolerant timestamp normalization (see
    `_normalize_events_ts`): the loader works unchanged whether the
    generator wrote ``ts`` as timestamp[us] (NTZ or UTC-adjusted) or as
    legacy INT64 TIMESTAMP(NANOS). The ``nanosAsLong`` legacy conf is
    set only when the nanos encoding is actually present (plain reads
    of nanos parquet raise at schema-inference time), so non-events
    reads in the session are never affected by a side-effected conf.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        try:
            df = spark.read.parquet(path)
        except Exception:
            # Schema inference rejects INT64 TIMESTAMP(NANOS) unless the
            # legacy conf is on. Left set for the session on this branch
            # only: execution re-reads it from session state, so
            # restoring it here would break the scan at action time.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        return _normalize_events_ts(df)
    return spark.read.parquet(path)


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a scan whose file layout yields fewer
    partitions than the session's cores — the guide-§2.5 "one huge
    unsplittable input" fix, made SCALE-ADAPTIVE.

    The testdata tables are single-row-group parquet files, so every
    scan is ONE task no matter the core count: a compute-heavy
    per-row pass (per-feature md5 explodes, regex profiles, shingle
    hashing) runs single-threaded until its first exchange (measured:
    the q71 DSIR bucket-count pass fell 2.25 → 1.35 s from this one
    change). Apply it ONLY where per-row compute dominates — the
    repartition is itself a full shuffle of the scanned bytes, so on
    an input that is already wide it must be (and is) a no-op: any
    real corpus at cluster scale scans as thousands of row groups ≥
    cores, and this returns the input unchanged.

    PRECONDITION (ADVICE r15): call this only on EXCHANGE-FREE plans
    (scans / narrow unions of scans). The `df.rdd` partition probe
    builds the physical plan without running a job ONLY then — under
    AQE, `Dataset.rdd` on a plan containing exchanges materializes the
    intermediate query stages (submits the shuffle jobs) right here.
    Every current call site is a scan-side widen; keep it that way."""
    n = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def literal_df(
    spark: SparkSession, rows: list, schema, parts: int = 2
) -> DataFrame:
    """Literal fixture frame with BOUNDED partitions. Plain
    `createDataFrame` slices a rows list across the session default
    parallelism (32 on the local test host), so a 4-row literal
    becomes ~1-row tasks — and across a many-branch plan those
    near-empty tasks dominate the wall clock (the round-14 q94
    finding: 12.0 → 3.5 s fused warm after bounding the fixture
    partitioning; the q64 tokenizer trainers saved 0.1-0.3 s per
    driver-probe call the same way). Literal fixtures are O(1)-sized
    by construction, so 2 partitions serialize nothing that scales —
    at 100 TB real inputs arrive through the file sources, whose
    partitioning follows the data."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts), schema
    )


def load_tables(
    spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> None:
    """Expose the tables to `spark.sql` (S5)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, **options
) -> DataFrame:
    """S1/S2: schema-declared CSV scan; `path` may be a glob.

    Replaces `list.files(pattern=...)` + per-file append
    (`DatabaseCreation.R:32-36`) with one distributed scan.
    """
    opts = {"header": "true", "mode": "FAILFAST"}
    opts.update(options)
    return spark.read.schema(schema).options(**opts).csv(path)


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """S3: stage-table sink (parquet). Replaces `dbWriteTable(...,
    overwrite=TRUE)` (`DatabaseCreation.R:15-29`)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles ONCE at write time so every
    later equi-join/aggregation on `bucket_by` is exchange-free.

    This is the co-location strategy for repeatedly-joined 100 TB
    facts — e.g. tracking ⋈ plays ⋈ player_play all bucket by
    (gameId, playId); the per-frame fact⋈fact join (SURVEY §2.3 J10)
    then needs no shuffle at all (verified in
    tests/test_sources.py::test_bucketed_join_no_exchange). sort_by
    additionally orders within buckets (frameId) so window functions
    over the bucket key start from sorted runs."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S6: CSV sink (`QBReadStats.R:263`, `DefCoverage.ipynb` cell 9)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def assert_unique_key(df: DataFrame, keys: list[str]) -> None:
    """S7: the PK/FK DDL of `DatabaseCreation.R:60-73` (silently
    non-functional in SQLite) becomes an executable invariant."""
    dup = df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError(f"duplicate key {keys}")


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema,
    corrupt_col: str = "_corrupt_record",
):
    """JSONL source — the de-facto interchange format for training
    corpora. An EXPLICIT schema is required: at 100 TB, schema
    inference is a full extra pass over the data and a determinism
    hazard (sampled inference can flip types between runs).

    Malformed lines survive in `corrupt_col` (PERMISSIVE mode) instead
    of failing the job or silently disappearing — at corpus scale some
    fraction of lines IS broken, and dropping them must be an explicit,
    measurable decision (`filter(col(corrupt_col).isNull())`), not a
    side effect. Spark requires the corrupt column to be part of the
    schema, so it is appended here.

    Caveat (Spark restriction, pinned in test_sources): a query whose
    referenced columns are ONLY the corrupt column (e.g.
    ``filter(corrupt.isNotNull()).count()``) raises
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — Spark
    refuses to re-parse the file just for error bookkeeping. Quarantine
    flows should select data columns alongside it (writing bad lines
    out with their payload — which a real quarantine does anyway) or
    cache() first when only counting."""
    from pyspark.sql.types import StringType, StructField, StructType

    fields = list(schema.fields)
    # re-reading a quarantine output with a schema taken from a prior
    # read_jsonl result must not duplicate the corrupt column
    if corrupt_col not in schema.fieldNames():
        fields.append(StructField(corrupt_col, StringType()))
    full = StructType(fields)
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    """JSONL sink (partition-parallel unless a single file is asked
    for — same policy as `write_csv`)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — the second columnar interchange format Spark ships
    natively (Hive-ecosystem counterpart of parquet; same predicate-
    pushdown/column-pruning/min-max-stats story, so everything SCALE.md
    says about parquet scans holds). Partition-parallel."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (glob-capable like the CSV/JSONL readers). Schema
    travels in the file footer, so no explicit schema is needed —
    unlike JSONL there is no inference pass to avoid."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob_filter: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """The MEDIA-INGEST source (round 13): Spark's built-in
    `binaryFile` format — one row per file with (path,
    modificationTime, length, content binary). This is how raw
    image/audio/video files land as the binary payload columns the
    multimodal layer processes; at 100 TB the listing parallelizes
    and each file reads where its task runs, no driver-side IO.

    Caveat (measured on Spark 4.1): ZERO-LENGTH files are silently
    skipped by the binaryFile file index — an empty blob never
    surfaces a row. If empties carry meaning upstream, land them with
    a sentinel byte or track them in a manifest.

    `glob_filter` maps to pathGlobFilter (server-side name filter —
    files that do not match are never opened). `max_bytes` protects
    against a surprise multi-GB blob OOMing a task TWO ways, because
    an in-plan guard alone fires only AFTER the blob has materialized
    into the row: (1) a loud EAGER check over a content-free
    projection (the binaryFile source prunes the content column, so
    the probe reads file STATUSES only — one cheap listing job, the
    assert_unique_key precedent) raises ValueError naming the first
    offending file; (2) the returned frame carries a pushed-down
    `length <= max_bytes` filter, which the binaryFile source applies
    at the FILE INDEX — oversized files are never opened even if one
    appears between the probe and the read."""
    reader = spark.read.format("binaryFile")
    if glob_filter is not None:
        reader = reader.option("pathGlobFilter", glob_filter)
    df = reader.load(path)
    if max_bytes is not None:
        bound = int(max_bytes)
        over = (
            df.select("path", "length")  # content pruned: status-only
            .filter(F.col("length") > bound)
            .limit(1)
            .collect()
        )
        if over:
            raise ValueError(
                f"read_binary_files: file exceeds max_bytes={bound}: "
                f"{over[0].path} ({over[0].length} bytes) — raise the "
                "bound or exclude it via glob_filter"
            )
        df = df.filter(F.col("length") <= bound)
    return df


def read_text_files(
    spark: SparkSession,
    path: str,
    wholetext: bool = True,
    line_sep: str | None = None,
) -> DataFrame:
    """The raw-CORPUS ingest source: Spark's built-in `text` format.
    `wholetext=True` (default) reads ONE ROW PER FILE — the
    one-document-per-file layout raw LLM corpora arrive in before any
    parquet conversion; False reads one row per line (log-style
    inputs, optionally with a custom `line_sep`). Either way the
    column is `value string` and the scan parallelizes per file/split
    like any other source."""
    # NOTE: pass these as .text() kwargs, not reader options — on
    # Spark 4.1 `option("wholetext", "true")` is silently ignored by
    # DataFrameReader.text (measured: 2 rows for a 2-line file), the
    # kwarg form is honored
    return spark.read.text(path, wholetext=wholetext, lineSep=line_sep)

"""PySpark-native analytics engine with the query/data-processing surface of
Bdet23/BigDataBowl2024-25 (reference snapshot at /root/reference, read-only).

The reference is an NFL tracking-data analytics project (R + SQLite +
pandas notebooks). This package re-expresses its capability surface —
star-schema relational ops, frame-series window analytics, numeric
openness kernels, ML feature pipelines — as an idiomatic Spark engine,
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB deployment needs.

Layout:
    session.py    SparkSession factory (AQE, Arrow, UTC, broadcast tuning)
    sources/      readers/writers (S1-S7 in SURVEY.md §2.1)
    operators/    relational/window/agg operators (§2.2-2.7)
    functions/    scalar function layer (§2.8) + numeric kernels (§2.9)
    pipelines/    the reference's five stage DAGs re-built on DataFrames
    suite/        registered parity queries + DuckDB oracle SQL
    streaming/    structured-streaming replay of the frame stream (§2.10)
"""

__version__ = "0.1.0"

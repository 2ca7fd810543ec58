"""Every registered suite query must match its DuckDB oracle at
sf0.001 (fast, run always). Set BDB_PARITY_SF=/root/testdata/sf0.01 to
reproduce the driver's t2 gate exactly."""

from __future__ import annotations

import os

import pytest

from bigdatabowl2024_25_spark import suite
from tests.oracle_harness import check_query

suite.load_all()

SF_DIR = os.environ.get("BDB_PARITY_SF", "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(suite.QUERIES))
def test_parity(spark, name):
    check_query(spark, name, suite.QUERIES[name], suite.ORACLE.get(name), SF_DIR)


def test_q64_parity_with_degenerate_documents(spark, tmp_path):
    """Regression for the phantom-chunk oracle defect (ADVICE r7): an
    empty, whitespace-only, or NULL document must produce zero 'chunk'
    rows on BOTH engines — before the fix the DuckDB oracle emitted a
    NULL-digest chunk row with no Spark counterpart. Runs the real q64
    query + oracle over an sf0.001 clone whose documents table is
    augmented with the three degenerate shapes."""
    import os

    import duckdb

    from bigdatabowl2024_25_spark.sources.io import TESTDATA_TABLES

    clone = tmp_path / "sf_degenerate"
    clone.mkdir()
    for t in TESTDATA_TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", clone / f"{t}.parquet")
    duckdb.sql(
        f"""
        COPY (
            SELECT * FROM '{SF_DIR}/documents.parquet' WHERE doc_id < 20
            UNION ALL
            SELECT * FROM (VALUES
                (900001, '', 'en', 'degenerate', 0),
                (900002, '   ', 'en', 'degenerate', 3),
                (900003, NULL, 'en', 'degenerate', NULL)
            ) t(doc_id, text, lang, source, n_chars)
        ) TO '{clone}/documents.parquet' (FORMAT PARQUET)
        """
    )
    name = "q64_binary_plumbing"
    check_query(spark, name, suite.QUERIES[name], suite.ORACLE[name], str(clone))

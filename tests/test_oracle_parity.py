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

#: default-tier parity subset (round 16, VERDICT item 2): one query
#: per operator family keeps the oracle harness exercised end-to-end
#: in the <10-min default tier; the FULL 50-query sweep is `slow` —
#: the driver's own CORRECTNESS gate re-derives every declared query
#: against DuckDB each round, so the in-repo sweep duplicates that
#: evidence and belongs in the deep tier (`pytest -m slow`).
_DEFAULT_TIER = {
    "q01_pricing_summary",      # relational agg
    "q08_latest_order_per_customer",  # windows
    "q35_asof_click_view",      # asof/range joins
    "q38_cms_point_counts",     # sketches
    "q53_null_cascade",         # scalar/null semantics
    "q60_text_profile",         # text features
    "q72_near_dup_pairs",       # dedup funnel (minhash→LSH→verify)
    "q75_dedup_survivors",      # components + splits
    "q82_ann_lsh_topk",         # similarity/ANN
    "q91_bdb_pipeline",         # BDB DAG
    # q93_streaming_windows is the single most expensive parity check
    # (54 s); streaming operators keep default-tier coverage through
    # tests/test_streaming_* and the driver gate re-checks q93 itself
    "q94_codec_roundtrip",      # multimodal codecs
    "q95_source_sink_roundtrip",  # sources/sinks
}


@pytest.mark.parametrize(
    "name",
    [
        n if n in _DEFAULT_TIER
        else pytest.param(n, marks=pytest.mark.slow)
        for n in sorted(suite.QUERIES)
    ],
)
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

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

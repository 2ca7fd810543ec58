"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship pricing-summary query at sf0.001;
`queries()` / `oracle_sql()` expose every registered parity query from
`bigdatabowl2024_25_spark.suite` (one per implemented operator family
in SURVEY.md §2, plus the LLM-data-pipeline operators).
"""

from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from bigdatabowl2024_25_spark import suite  # noqa: E402

suite.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return suite.QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(suite.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(suite.ORACLE)

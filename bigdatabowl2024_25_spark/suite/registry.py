"""Query/oracle registry backing `__spark_entry__.queries()`."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

#: The driver's correctness snapshot records at most this many queries
#: (observed r01: 73 registered → 50 checked; r05: 53 → 50). Anything
#: registered past the cap is silently driver-invisible, so overflow
#: must be a loud local failure: consolidate redundant queries into
#: branches of one query instead of registering new names.
DRIVER_QUERY_CAP = 50


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a parity query; `oracle` is equivalent DuckDB SQL (omit
    only for genuinely non-SQL-expressible ops → driver does a weaker
    rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name}")
        QUERIES[name] = fn
        if len(QUERIES) > DRIVER_QUERY_CAP:
            raise ValueError(
                f"query registry overflow: {len(QUERIES)} > "
                f"{DRIVER_QUERY_CAP} ({name} would be driver-invisible); "
                "merge it into an existing query's branches instead"
            )
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco

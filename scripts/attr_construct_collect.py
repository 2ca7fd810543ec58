"""Construction-vs-collect wall-time split for every headline query.

The bench times ``fn(spark, sf_dir).collect()`` as one number, but the
two phases have opposite optimization levers: COLLECT time is one
Spark job whose independent union branches already run as concurrent
stages, while CONSTRUCTION time is serial driver work — eager
``localCheckpoint`` (toRdd mini-executions under AQE), driver-loop
trainers, sink writes, and the size-adaptive CC's strategy count all
execute one after another on an otherwise idle 32-core box. A query
whose time is mostly construction is a candidate for the guide's §2.6
"overlap independent jobs" treatment; a query that is mostly collect
needs plan surgery instead.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
           python scripts/attr_construct_collect.py [query-prefixes...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from bigdatabowl2024_25_spark import suite  # noqa: E402
from bigdatabowl2024_25_spark.session import get_spark  # noqa: E402

from bench import HEADLINE  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suite.load_all()
    spark = get_spark(app_name="bdb-attr-construct-collect")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).groupBy(
        (F.col("id") % 7).alias("k")
    ).count().collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    prefixes = sys.argv[1:]
    names = [
        n for n in HEADLINE
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = suite.QUERIES[name]
        fn(spark, sf_dir).collect()  # warm (codegen, broadcasts)
        best: dict[str, float] | None = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            cur = {
                "construct": round(t1 - t0, 3),
                "collect": round(t2 - t1, 3),
                "total": round(t2 - t0, 3),
            }
            if best is None or cur["total"] < best["total"]:
                best = cur
        out[name] = best or {}
        print(json.dumps({name: best}), flush=True)
    print(json.dumps({"summary": out}))
    spark.stop()


if __name__ == "__main__":
    main()

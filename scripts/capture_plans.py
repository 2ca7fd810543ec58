"""Dump `.explain("formatted")` for headline queries to plans/<tag>/.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
           python scripts/capture_plans.py <outdir-suffix> [query-prefixes...]

e.g. `python scripts/capture_plans.py r15/before q74 q64` writes
plans/r15/q74_near_dup_clusters_before.txt etc. — the suffix after the
last '/' becomes the filename suffix.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdatabowl2024_25_spark import suite  # noqa: E402
from bigdatabowl2024_25_spark.session import get_spark  # noqa: E402

from bench import HEADLINE  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spec = sys.argv[1]  # e.g. "r15/before"
    outdir = Path(__file__).resolve().parents[1] / "plans" / Path(spec).parent
    suffix = Path(spec).name
    outdir.mkdir(parents=True, exist_ok=True)
    prefixes = sys.argv[2:]
    names = [
        n for n in HEADLINE
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    suite.load_all()
    spark = get_spark(app_name="bdb-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = suite.QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = outdir / f"{name}_{suffix}.txt"
        path.write_text(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()

"""Per-branch wall-time attribution for q74_near_dup_clusters
(round-15 VERDICT item 5: shave or re-attribute the ~10-12 s floor —
the single largest remaining bench chunk).

q74 is a union of five branches over two independent inputs:
- 'cc'   — the q72 jaccard funnel (shingle→minhash→LSH→verify) into
           connected components (reliable-checkpoint mode), and
- 'pr' / 'hub' / 'auth' / 'trust' — three centrality algorithms over
  the customer→supplier fact⋈fact edge list (shared lazy
  localCheckpoint).

Every branch carries a DISTINCT `kind` literal, so
``q74(...).filter(kind == name)`` prunes the others at plan time
(the bench_q94_branches pattern) — each timed collect executes
exactly one branch. hub/auth share one `hits()` call, so their
isolated times double-count it; the fused run is the truth, the
ranking is the signal.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
           python scripts/bench_q74_branches.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from bigdatabowl2024_25_spark.session import get_spark  # noqa: E402
from bigdatabowl2024_25_spark.suite.dedup import (  # noqa: E402
    q72_near_dup_pairs,
    q74_near_dup_clusters,
)

BRANCHES = ["cc", "pr", "hub", "auth", "trust"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bdb-q74-branches")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).groupBy(
        (F.col("id") % 7).alias("k")
    ).count().collect()

    out: dict[str, list[float]] = {}

    def timed(label: str, thunk) -> None:
        # REBUILD the plan per collect (bench.py does the same):
        # localCheckpoint materializations are per-DataFrame, so
        # collecting one cached object would measure the
        # post-checkpoint replay (~0.3 s), not the per-run cost the
        # headline bench actually pays
        thunk().collect()  # warm (JIT/codegen only — state not kept)
        samples = []
        for _ in range(2):
            # t0 BEFORE construction: q74 does driver-side eager work
            # inside the query callable (the size-adaptive CC collects
            # its funnel-sized edge list), exactly like bench.py's
            # `fn(spark, sf_dir).collect()` timing
            t0 = time.perf_counter()
            thunk().collect()
            samples.append(round(time.perf_counter() - t0, 3))
        out[label] = samples
        print(f"{label:18s} {samples}", file=sys.stderr)

    # the q72 subtree alone (the funnel the 'cc' branch sits on)
    timed("q72_subtree", lambda: q72_near_dup_pairs(spark, sf_dir))
    for b in BRANCHES:
        timed(
            f"branch:{b}",
            lambda b=b: q74_near_dup_clusters(spark, sf_dir).filter(
                F.col("kind") == b
            ),
        )
    timed("fused", lambda: q74_near_dup_clusters(spark, sf_dir))
    print(json.dumps({
        "metric": "q74_branch_attribution",
        "sf_dir": sf_dir,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "timings": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

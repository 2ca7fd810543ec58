"""Generic per-branch wall-time attribution for the union-shaped
headline queries.

Every multi-branch query tags rows with a literal discriminator
column ('kind' or 'branch'); filtering on it prunes the other
branches at plan time (the bench_q94_branches pattern), so a timed
``fn(...).filter(disc == v).collect()`` executes exactly one branch —
plus whatever eager construction work the query does regardless
(trainers, localCheckpoints, the eager CC). Shared subtrees are
charged to every consumer; the fused run is the truth, the ranking is
the signal.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
           python scripts/attr_branches.py q71 q70 ...
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

#: query → discriminator column
DISC = {
    "q64_binary_plumbing": "kind",
    "q70_corpus_hygiene": "branch",
    "q71_signatures_and_selection": "branch",
    "q72_near_dup_pairs": "kind",
    "q74_near_dup_clusters": "kind",
    "q75_dedup_survivors": "branch",
    "q80_cosine_search": "kind",
    "q82_ann_lsh_topk": "kind",
    "q83_ann_ivf_topk": "kind",
    "q95_source_sink_roundtrip": "kind",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suite.load_all()
    spark = get_spark(app_name="bdb-attr-branches")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).groupBy(
        (F.col("id") % 7).alias("k")
    ).count().collect()

    prefixes = sys.argv[1:]
    names = [
        n for n in DISC
        if not prefixes or any(n.startswith(p) for p in prefixes)
    ]
    for name in sorted(names):
        fn, disc = suite.QUERIES[name], DISC[name]
        values = sorted(
            r[0]
            for r in fn(spark, sf_dir).select(disc).distinct().collect()
        )
        # group expect:*/tok:*/qw:*/lm:*-style families by prefix
        fams = sorted({v.split(":")[0] for v in values})
        per: dict[str, float] = {}
        for fam in fams:
            flt = F.col(disc).startswith(fam)
            fn(spark, sf_dir).filter(flt).collect()  # warm
            t0 = time.perf_counter()
            fn(spark, sf_dir).filter(flt).collect()
            per[fam] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        fused = round(time.perf_counter() - t0, 3)
        print(
            json.dumps(
                {
                    "query": name,
                    "fused_warm": fused,
                    "branches": dict(
                        sorted(per.items(), key=lambda kv: -kv[1])
                    ),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

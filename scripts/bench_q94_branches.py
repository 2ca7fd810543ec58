"""Per-branch wall-time attribution for q94_codec_roundtrip.

The headline bench times q94 as one union of 16 codec branches, so a
regression inside it is invisible (r13 VERDICT: 11.2-12.0 s warmed
quiet readings vs the claimed 7.3-9.8 s steady state, no attribution).
Unlike q64 (whose branches need trainer-side rebuilds), every q94
branch carries a DISTINCT `codec` literal, so
``q94(...).filter(codec == name)`` lets Catalyst constant-fold the
other branches' literals to false and PropagateEmptyRelation prune
them — each timed collect executes exactly one branch, no refactor.

Caveats on reading the numbers:
- shared subtrees are re-executed per branch (the dhash fixture feeds
  dhash64/dhash/dincr; the afp fixture feeds afp64/afp; the mixed
  `media` generator feeds png/jpeg/wav/mjpeg — generation is inside a
  mapInPandas, which no filter pushes through), so the per-branch SUM
  exceeds the fused wall; the RANKING is the signal, not the sum.
- q94's first fused run in a session spikes 19-24 s on union codegen
  (SCALE.md round-13 note); this script's fused cold/warm pair makes
  that visible instead of folding it into branch times.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
           python scripts/bench_q94_branches.py
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
from bigdatabowl2024_25_spark.suite.multimodal_q import (  # noqa: E402
    q94_codec_roundtrip,
)

#: every codec literal in the union, in plan order
BRANCHES = [
    "png", "jpeg", "wav", "mjpeg",
    "dhash64", "dhash", "dincr",
    "afp64", "afp",
    "vfp64", "vfp",
    "adpcm", "ifv", "mdct", "xcode", "vxcode",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bdb-q94-branches")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    q94_codec_roundtrip(spark, sf_dir).collect()
    cold_total = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    q94_codec_roundtrip(spark, sf_dir).collect()
    warm_total = round(time.perf_counter() - t0, 3)

    per_branch: dict[str, dict] = {}
    for name in BRANCHES:
        df = q94_codec_roundtrip(spark, sf_dir).filter(
            F.col("codec") == name
        )
        n = len(df.collect())  # warm-up: absorbs the branch's codegen
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            df.collect()
            samples.append(round(time.perf_counter() - t0, 3))
        per_branch[name] = {"sec": min(samples), "rows": n,
                            "readings": samples}

    branch_sum = round(sum(b["sec"] for b in per_branch.values()), 3)
    print(json.dumps({
        "fused_cold_sec": cold_total,
        "fused_warm_sec": warm_total,
        "branch_sum_sec": branch_sum,
        "branches": per_branch,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "sf_dir": sf_dir,
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()

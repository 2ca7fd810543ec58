"""Per-branch attribution for the text-fixture family q60/q65/q72 —
the three queries that drifted +40%/+60%/+37% driver-to-driver in
round 12 with untouched code (VERDICT r12 watch-list item 1). The
`bench_q64_branches.py` treatment: isolate where each query's time
goes so the NEXT driver regression is attributable in one run, and
run a same-session A/B (two interleaved passes over identical plans)
so ambient drift is distinguishable from real regressions — within
one session, identical code should repeat within scheduler noise;
across driver rounds the documented ambient envelope spreads 2x.

q60 has no union branches (it is ONE fused per-row select — that is
the point of the query), so its legs are COLUMN FAMILIES: selecting a
subset lets Catalyst prune the unused expression trees, which times
each family's expression cost inside the same scan.

Usage: python scripts/bench_text_family.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdatabowl2024_25_spark import suite  # noqa: E402
from bigdatabowl2024_25_spark.session import get_spark  # noqa: E402

#: q60 column families (suite/text.py q60_text_profile select list)
Q60_GROUPS = {
    "counts": ["n_tokens", "n_regex_tokens", "char_len"],
    "quality": ["avg_word_len", "punct_ratio", "stopword_ratio"],
    "langid": ["predicted_lang", "is_match"],
    "fingerprints": ["fp", "fp64"],
    "bm25": ["bm25"],
    "repetition": ["dup_word_frac", "top_bigram_frac"],
    "pii": ["pii_md5"],
    "url": ["url_host", "url_domain", "url_depth", "url_keep"],
    "qcls": ["qcls_logit", "qcls_keep"],
}

QUERIES = [
    "q60_text_profile",
    "q65_winnowing_fingerprints",
    "q72_near_dup_pairs",
]


def timed(df) -> float:
    t0 = time.perf_counter()
    df.collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    suite.load_all()
    spark = get_spark(app_name="bench-text-family")
    spark.sparkContext.setLogLevel("ERROR")
    # the bench.py session pre-warm, verbatim
    spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count().collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # same-session A/B: two interleaved passes over identical plans
    ab: dict[str, list[float]] = {n: [] for n in QUERIES}
    for name in QUERIES:  # warm pass (JIT/codegen), not counted
        suite.QUERIES[name](spark, sf_dir).collect()
    for _ in range(2):
        for name in QUERIES:
            ab[name].append(timed(suite.QUERIES[name](spark, sf_dir)))

    # q60 column-family isolation (subset select → Catalyst prunes
    # the other families' expression trees out of the same scan)
    q60 = suite.QUERIES["q60_text_profile"](spark, sf_dir)
    q60.select("doc_id").collect()  # scan/codegen warm
    groups: dict[str, float] = {}
    for gname, cols in Q60_GROUPS.items():
        df = q60.select("doc_id", *cols)
        df.collect()  # per-group codegen warm
        groups[gname] = timed(df)
    groups["ALL"] = timed(q60)

    print(
        json.dumps(
            {
                "same_session_ab_sec": ab,
                "q60_column_family_warm_sec": dict(
                    sorted(groups.items(), key=lambda kv: -kv[1])
                ),
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

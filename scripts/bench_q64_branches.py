"""Per-branch wall-time attribution for q64_binary_plumbing.

The headline bench times q64 as one union of ~19 branches, so a
regression inside it is invisible (r11 VERDICT: +52% driver-to-driver
with no attribution). This script:

1. runs the fused q64 twice (cold + warm) for the baseline number;
2. builds the branch dict ONCE, timing the build — the four tokenizer
   trainers run eagerly at build time (driver-probe loops), so build
   time is trainer time plus plan construction;
3. times each trainer call individually (the r11 suspects);
4. collects each branch in isolation (one warm-up collect, one timed).

Shared subtrees (the wp/uni `encode_tokenizers` pass, clean/dclean's
`prepare_corpus` stages) are charged to every branch that consumes
them, so the per-branch sum exceeds the fused wall; the RANKING is
the signal, not the sum.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
           python scripts/bench_q64_branches.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdatabowl2024_25_spark.session import get_spark  # noqa: E402
from bigdatabowl2024_25_spark.suite import text as t  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bdb-q64-branches")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    t.q64_binary_plumbing(spark, sf_dir).collect()
    cold_total = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    t.q64_binary_plumbing(spark, sf_dir).collect()
    warm_total = round(time.perf_counter() - t0, 3)

    from bigdatabowl2024_25_spark.operators.bpe import (
        bpe_train,
        byte_bpe_train,
        unigram_train,
        wordpiece_train,
    )

    corpus = spark.createDataFrame(t._BPE_CORPUS, "doc_id long, text string")
    trainers = {
        "bpe_train": lambda: bpe_train(corpus, "text", len(t._BPE_MERGES)),
        "wp_train": lambda: wordpiece_train(corpus, "text", n_merges=10),
        "uni_train": lambda: unigram_train(
            corpus, "text", target_vocab=12, max_piece_len=6, n_em_iters=2
        ),
        "bbpe_train": lambda: byte_bpe_train(corpus, "text", 12),
    }
    trainer_sec: dict[str, float] = {}
    for name, fn in trainers.items():
        fn()  # warm
        t0 = time.perf_counter()
        fn()
        trainer_sec[name] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    frames = t._q64_branch_frames(spark, sf_dir)
    build_sec = round(time.perf_counter() - t0, 3)
    timings: dict[str, float] = {}
    for name, frame in frames.items():
        frame.collect()
        t0 = time.perf_counter()
        frame.collect()
        timings[name] = round(time.perf_counter() - t0, 3)
    ranked = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
    )
    print(
        json.dumps(
            {
                "fused_cold": cold_total,
                "fused_warm": warm_total,
                "dict_build_sec": build_sec,
                "trainer_sec": trainer_sec,
                "branch_warm_collect_sec": ranked,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Per-band LSH bucket-occupancy attribution for q72's candidate
self-join (round-16 VERDICT item 1: root-cause the measured 1.62
growth exponent instead of re-measuring it).

For each scale point this script rebuilds exactly q72's banded
relation (manufactured corpus → shingles → distinct hashes → k=8
signatures → 4 band keys/doc) and reports, WITHOUT timing noise:

- docs, distinct band keys, and the occupancy distribution
  (max, p99, mean) per band index and overall;
- the structural candidate floor Σ_buckets c·(c−1)/2 (what the
  band self-join MUST emit before the distinct), the distinct
  candidate count, and the verified-pair count;
- the same candidate floor under max_bucket caps (the production
  guard), plus the surviving verified pairs — i.e. the exact
  recall cost of each cap at that scale.

Usage:
    python scripts/attr_q72_occupancy.py [x8]   # extra up-factors
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

# reuse the probe's faithful scale-point generators
from scale_probe import SF001, SF01, _gen_upscale_dirs  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from bigdatabowl2024_25_spark.operators.dedup import (  # noqa: E402
    jaccard_pairs,
    lsh_candidates,
    minhash_signatures,
    shingle_hashes,
    with_shingles,
)
from bigdatabowl2024_25_spark.session import get_spark  # noqa: E402
from bigdatabowl2024_25_spark.suite.dedup import (  # noqa: E402
    _BANDS,
    _K,
    _corpus_df,
)

CAPS = (None, 64, 32, 16, 8)


def main() -> None:
    import scale_probe

    extra = [int(a.lstrip("x")) for a in sys.argv[1:]]
    if extra:
        scale_probe.UP_FACTORS = tuple(
            sorted(set(scale_probe.UP_FACTORS) | set(extra))
        )
    dirs = [("sf0.01", SF001), ("sf0.1", SF01)]
    for fac, d in sorted(_gen_upscale_dirs().items()):
        dirs.append((f"x{fac}", d))

    spark = get_spark(app_name="bdb-attr-q72-occupancy")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for label, d in dirs:
        corpus = _corpus_df(spark, d)
        shingled = with_shingles(corpus, "text", "doc_id")
        hashes = shingle_hashes(shingled, "doc_id").localCheckpoint()
        sigs = minhash_signatures(
            shingled, "doc_id", k=_K, hashes=hashes
        )
        from bigdatabowl2024_25_spark.operators.dedup import band_keys

        banded = sigs.select(
            F.col("doc_id").alias("doc"),
            F.posexplode(F.array(*band_keys(_K, _BANDS))).alias(
                "band", "band_key"
            ),
        ).localCheckpoint()
        n_docs = corpus.count()
        occ = banded.groupBy("band", "band_key").agg(
            F.count("*").alias("c")
        ).localCheckpoint()
        per_band = {
            int(r["band"]): {
                "buckets": int(r["nb"]),
                "max_occ": int(r["mx"]),
                "pairs_floor": int(r["pf"]),
            }
            for r in occ.groupBy("band")
            .agg(
                F.count("*").alias("nb"),
                F.max("c").alias("mx"),
                F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pf"),
            )
            .collect()
        }
        top = [
            {"band": int(r["band"]), "occ": int(r["c"])}
            for r in occ.orderBy(F.desc("c")).limit(5).collect()
        ]
        import time as _time

        def _timed_funnel(cap):
            """(cands, verified, min-of-2 sec) for the band→verify
            funnel at a given occupancy cap — the end-to-end
            cap-vs-time curve VERDICT item 7 asks for."""
            ccand = lsh_candidates(
                sigs, "doc_id", k=_K, bands=_BANDS, max_bucket=cap
            )
            nc = ccand.count()
            ver = jaccard_pairs(
                ccand, shingled, "doc_id", threshold=0.4, hashes=hashes
            )
            nv = ver.count()  # warm
            secs = []
            for _ in range(2):
                t0 = _time.perf_counter()
                ver.write.format("noop").mode("overwrite").save()
                secs.append(round(_time.perf_counter() - t0, 3))
            return nc, nv, min(secs)

        n_cand, n_ver, sec_uncapped = _timed_funnel(None)
        caps = {}
        for cap in CAPS:
            if cap is None:
                continue
            nc, nv, sec = _timed_funnel(cap)
            caps[str(cap)] = {"cands": nc, "verified": nv, "sec": sec}
        out[label] = {
            "docs": n_docs,
            "pairs_floor_total": sum(
                b["pairs_floor"] for b in per_band.values()
            ),
            "cands_distinct": n_cand,
            "verified_pairs": n_ver,
            "funnel_sec_uncapped": sec_uncapped,
            "per_band": per_band,
            "top_buckets": top,
            "capped": caps,
        }
        print(json.dumps({label: out[label]}), flush=True)
    spark.stop()
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()

"""Empirical growth-exponent probe for the heavy headline queries
(round-15 VERDICT item 1: "measure the scale story instead of arguing
it").

Every 100 TB claim in SCALE.md is a DESIGN argument (bucketed,
banded, broadcast, bounded) verified at one scale factor. This script
pins the actual growth exponents: it times each heavy query at four
scale points and fits log(time) vs log(scale), so a super-linear
funnel (e.g. a banded join whose candidate set grows quadratically in
a skewed band) shows up as a number instead of staying invisible.

Scale points:
- the driver-generated sf0.01 and sf0.1 (/root/testdata),
- two FAITHFUL intermediate points subsampled from sf0.1 by
  prefix-of-id filters (fractions 0.25 / 0.5), written once to
  .scale/probe_f{frac}/. Prefix subsets of the real distribution are
  honest scale points by construction — unlike cloned or
  regenerated data, they cannot distort dup rates, vocabulary, or
  key skew (beyond the sampling itself). Referential integrity is
  kept by filtering orders and lineitem on the same orderkey cutoff.
- two points ABOVE sf0.1 (x2 / x4, i.e. ~sf0.2 / ~sf0.4), written
  once to .scale/probe_x{k}/. Naive row-cloning would distort the
  quantities the funnels key on (every clone is an exact dup of its
  original; every banded join would see cross-copy collisions), so
  each extra copy is instead an ISOMORPHIC UNIVERSE of sf0.1:
    * every integer key family (custkey, orderkey, partkey, suppkey,
      event/user id, doc_id, vec_id) is offset by copy_index *
      (max_key + 1), so joins/graphs gain disjoint, structurally
      identical components and referential integrity holds exactly;
    * document TEXT gets a per-(copy, word-count) seeded word
      shuffle: length, vocabulary, and character distributions are
      preserved EXACTLY (so per-doc compute is identical), identical
      texts stay identical (within-copy exact-dup rate preserved),
      while cross-copy shingle overlap is destroyed (no synthetic
      band collisions between copies); n_chars is recomputed;
    * embeddings get small seeded Gaussian noise + renormalization:
      each copy lands in the same cluster structure, so IVF list
      occupancy and near-dup candidate volume grow the way a real
      corpus growing 2x/4x with the same distribution grows them;
    * region/nation stay single-copy (broadcast dims at every scale).
  Known residual bias, stated rather than hidden: positional word
  shuffling decoheres NEAR-dup (not exact-dup) similarity between
  different-length doc pairs within a copy, so the natural near-dup
  rate at x2/x4 is slightly LOWER per-row than at sf0.1 — it biases
  the funnel verify stage down a little, while every other stage
  (shingling, signatures, banding, per-bucket candidate volume,
  graph rounds) scales faithfully.

Caveats the exponent table must be read with (also in SCALE.md):
- The funnel queries inject a FIXED 80-doc dup/near-dup block
  (suite/dedup._corpus_df), so the injected candidate volume is
  constant across points — the measured exponent reflects the
  natural-corpus path, which is the one that scales.
- At these sizes (500-5000 docs) fixed scheduling/codegen overhead
  is a large fraction of wall time, which BIASES exponents DOWN.
  An exponent near 1.0 here means "at worst linear"; the red flag
  the probe exists to catch is anything >1.5 on the top pair.
- The headline exponent is fitted on the TOP PAIR of whatever point
  set ran (x2 → x4 when the up-scale dirs are included — 10k-20k
  docs / 1.2M-2.4M lineitem rows, where the data term dominates most;
  f0.5 → sf0.1 under --no-up); the full multi-point fit is reported
  alongside.

Usage:
    python scripts/scale_probe.py            # all heavy queries
    python scripts/scale_probe.py q72 q74    # name prefixes to probe
    python scripts/scale_probe.py --no-up    # skip the x2/x4 points

Emits ONE JSON line (machine half) after a human-readable table, and
is deliberately bench.py-shaped: warm-up collect + min-of-2 timed
runs per (query, dir).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"
SCALE_DIR = REPO / ".scale"
FRACTIONS = (0.25, 0.5)
#: override with BDB_PROBE_UP="2,4,8" to add points (round 16: the
#: x8 isomorphic universe pins whether a funnel's exponent holds past
#: the x4 point the round-15 table ended at)
UP_FACTORS = tuple(
    int(x) for x in os.environ.get("BDB_PROBE_UP", "2,4").split(",")
)

#: heavy, corpus/embedding/graph-driven headline queries (fixture-
#: bounded q94/q95 deliberately excluded — their wall time is literal
#: fixtures, not sf) → the table whose row count DRIVES the cost (for
#: the scale axis: embeddings is 500→2000 rows over sf0.01→sf0.1
#: while documents is 500→5000, so "sf" is not a uniform axis).
HEAVY = {
    "q60_text_profile": "documents",
    "q64_binary_plumbing": "documents",
    "q65_winnowing_fingerprints": "documents",
    "q70_corpus_hygiene": "documents",
    "q71_signatures_and_selection": "documents",
    "q72_near_dup_pairs": "documents",
    "q73_simhash": "documents",
    "q74_near_dup_clusters": "lineitem",
    "q75_dedup_survivors": "documents",
    "q80_cosine_search": "embeddings",
    "q82_ann_lsh_topk": "embeddings",
    "q83_ann_ivf_topk": "embeddings",
}

#: (table, id column) pairs for the prefix-subsample filters. Dims
#: (region/nation) copy whole — they are broadcast-side constants at
#: every scale. orders/lineitem share the orderkey cutoff so FKs hold.
_SUBSET_RULES = {
    "region": None,
    "nation": None,
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _gen_probe_dirs() -> dict[float, str]:
    """Materialize .scale/probe_f{frac}/ once (idempotent: skipped if
    the dir already holds all tables)."""
    import duckdb

    con = duckdb.connect()
    out: dict[float, str] = {}
    for frac in FRACTIONS:
        d = SCALE_DIR / f"probe_f{frac}"
        d.mkdir(parents=True, exist_ok=True)
        out[frac] = str(d)
        if all((d / f"{t}.parquet").exists() for t in _SUBSET_RULES):
            continue
        # one orderkey cutoff keeps orders/lineitem consistent
        cut = con.execute(
            f"SELECT quantile_cont(o_orderkey, {frac}) "
            f"FROM '{SF01}/orders.parquet'"
        ).fetchone()[0]
        for t, idc in _SUBSET_RULES.items():
            src = f"{SF01}/{t}.parquet"
            dst = d / f"{t}.parquet"
            if idc is None:
                where = "TRUE"
            elif idc in ("o_orderkey", "l_orderkey"):
                where = f"{idc} <= {cut}"
            else:
                mx = con.execute(
                    f"SELECT max({idc}) FROM '{src}'"
                ).fetchone()[0]
                where = f"{idc} <= {int(mx * frac)}"
            con.execute(
                f"COPY (SELECT * FROM '{src}' WHERE {where}) TO "
                f"'{dst}' (FORMAT PARQUET)"
            )
    return out


#: key families for the isomorphic-copy construction: table →
#: {column: family}; each family's offset is max(base key) + 1, so
#: copies are disjoint and FKs hold exactly (the same family offset is
#: applied on both sides of every join edge).
_UPSCALE_KEYS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

_FAMILY_SOURCE = {
    "cust": ("customer", "c_custkey"),
    "order": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supp": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def _shuffle_words(texts, k: int):
    """Per-(copy, word-count) seeded positional word shuffle.

    One permutation per distinct word count, so identical texts map to
    identical outputs (exact-dup structure preserved within the copy)
    while different copies of the same text share no shingles.
    """
    import numpy as np

    perms: dict[int, "np.ndarray"] = {}
    out = []
    for t in texts:
        w = t.split()
        n = len(w)
        if n < 2:
            out.append(t)
            continue
        p = perms.get(n)
        if p is None:
            p = np.random.default_rng(1_000_003 * k + n).permutation(n)
            perms[n] = p
        out.append(" ".join(w[i] for i in p))
    return out


def _perturb_embeddings(df, k: int):
    """Seeded Gaussian perturbation (~0.05 L2) + renormalize: the copy
    keeps the base's unit norm and cluster structure."""
    import numpy as np

    mat = np.vstack(df["embedding"].to_numpy()).astype(np.float32)
    rng = np.random.default_rng(7_919 * k)
    mat = mat + (
        0.05
        * rng.standard_normal(mat.shape).astype(np.float32)
        / np.sqrt(mat.shape[1])
    )
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    df["embedding"] = list(mat)
    return df


def _gen_upscale_dirs() -> dict[int, str]:
    """Materialize .scale/probe_x{K}/ once (idempotent)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out: dict[int, str] = {}
    todo = []
    for fac in UP_FACTORS:
        d = SCALE_DIR / f"probe_x{fac}"
        d.mkdir(parents=True, exist_ok=True)
        out[fac] = str(d)
        if not all(
            (d / f"{t}.parquet").exists()
            for t in _SUBSET_RULES
        ):
            todo.append(fac)
    if not todo:
        return out

    import pandas as pd

    base: dict[str, "pd.DataFrame"] = {}
    schemas: dict[str, "pa.Schema"] = {}
    for t in _SUBSET_RULES:
        tab = pq.read_table(f"{SF01}/{t}.parquet")
        schemas[t] = tab.schema
        base[t] = tab.to_pandas()
    offs = {
        fam: int(base[t][c].max()) + 1
        for fam, (t, c) in _FAMILY_SOURCE.items()
    }

    max_fac = max(todo)
    copies: dict[str, list["pd.DataFrame"]] = {
        t: [base[t]] for t in _UPSCALE_KEYS
    }
    for k in range(1, max_fac):
        for t, keys in _UPSCALE_KEYS.items():
            c = base[t].copy()
            for col, fam in keys.items():
                c[col] = c[col] + k * offs[fam]
            if t == "documents":
                c["text"] = _shuffle_words(c["text"].tolist(), k)
                c["n_chars"] = c["text"].str.len()
            elif t == "embeddings":
                c = _perturb_embeddings(c, k)
            copies[t].append(c)

    for fac in todo:
        d = SCALE_DIR / f"probe_x{fac}"
        for t in _SUBSET_RULES:
            dst = d / f"{t}.parquet"
            if t in _UPSCALE_KEYS:
                df = pd.concat(
                    copies[t][:fac], ignore_index=True
                )
            else:  # region/nation: broadcast dims, single copy
                df = base[t]
            pq.write_table(
                pa.Table.from_pandas(
                    df, schema=schemas[t], preserve_index=False
                ),
                dst,
            )
    return out


def _rows(path: str, table: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{path}/{table}.parquet").metadata.num_rows


def _fit_exponent(ns: list[int], ts: list[float]) -> float:
    """Least-squares slope of log t vs log n."""
    lx = [math.log(n) for n in ns]
    ly = [math.log(t) for t in ts]
    mx, my = sum(lx) / len(lx), sum(ly) / len(ly)
    num = sum((x - mx) * (y - my) for x, y in zip(lx, ly))
    den = sum((x - mx) ** 2 for x in lx)
    return num / den if den else float("nan")


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--no-up"]
    up = "--no-up" not in sys.argv[1:]
    prefixes = tuple(argv)
    names = [
        n for n in HEAVY
        if not prefixes or n.startswith(prefixes)
    ]
    dirs: list[tuple[str, str]] = [("sf0.01", SF001)]
    for frac, d in sorted(_gen_probe_dirs().items()):
        dirs.append((f"f{frac}", d))
    dirs.append(("sf0.1", SF01))
    if up:
        for fac, d in sorted(_gen_upscale_dirs().items()):
            dirs.append((f"x{fac}", d))

    from pyspark.sql import functions as F

    from bigdatabowl2024_25_spark import suite
    from bigdatabowl2024_25_spark.session import get_spark

    suite.load_all()
    spark = get_spark(app_name="bdb-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).groupBy(
        (F.col("id") % 7).alias("k")
    ).count().collect()

    result: dict[str, dict] = {}
    for name in names:
        fn = suite.QUERIES[name]
        drv = HEAVY[name]
        pts: list[dict] = []
        for label, d in dirs:
            n = _rows(d, drv)
            fn(spark, d).collect()  # warm
            samples = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, d).collect()
                samples.append(time.perf_counter() - t0)
            pts.append(
                {"dir": label, "n": n, "sec": round(min(samples), 3)}
            )
        ns = [p["n"] for p in pts]
        ts = [p["sec"] for p in pts]
        top = _fit_exponent(ns[-2:], ts[-2:])
        full = _fit_exponent(ns, ts)
        result[name] = {
            "driver_table": drv,
            "points": pts,
            "exp_top_pair": round(top, 2),
            "exp_all_points": round(full, 2),
        }
        print(
            f"{name:32s} n={ns}  t={[round(t, 2) for t in ts]}  "
            f"exp(top)={top:5.2f}  exp(all)={full:5.2f}",
            file=sys.stderr,
        )
    spark.stop()
    print(json.dumps({
        "metric": "scale_probe_exponents",
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "queries": result,
    }))


if __name__ == "__main__":
    main()

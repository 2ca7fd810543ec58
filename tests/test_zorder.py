"""Z-order clustered writes: Morton-key correctness against a pure
Python reference, and the actual payoff — parquet file/row-group
min/max stats narrow enough that BOTH interleaved dimensions prune,
where a single-column sort only prunes one."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.zorder import (
    interleave_bits,
    with_zvalue,
    write_zordered,
)


def ref_morton(vals: list[int], bits: int) -> int:
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * len(vals) + j)
    return out


def test_interleave_matches_reference(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 3, 128, 65535)],
        "x long, y long",
    )
    rows = df.select(
        "x", "y", interleave_bits([F.col("x"), F.col("y")], 16).alias("z")
    ).collect()
    for r in rows:
        assert r.z == ref_morton([r.x, r.y], 16), (r.x, r.y)
    with pytest.raises(ValueError):
        interleave_bits([F.col("x")] * 5, 16)  # 80 bits > 63


def test_with_zvalue_quantization_edges(spark):
    """Min maps to 0, max to 2^bits−1 (never overflowing into 2^bits),
    nulls to the minimum stripe; constant columns don't divide by 0."""
    df = spark.createDataFrame(
        [(0.0, 7.0), (50.0, 7.0), (100.0, 7.0), (None, 7.0)],
        "a double, c double",
    )
    rows = {
        (r["a"], r["c"]): r["__z"]
        for r in with_zvalue(df, ["a", "c"], bits=8).collect()
    }
    # c is constant → quantizes to 0 everywhere → z is a's bits spread
    assert rows[(0.0, 7.0)] == 0
    assert rows[(None, 7.0)] == 0
    assert rows[(100.0, 7.0)] == ref_morton([255, 0], 8)
    assert 0 < rows[(50.0, 7.0)] < rows[(100.0, 7.0)]


def test_with_zvalue_nan_and_all_null(spark):
    """A NaN row must quantize to the minimum stripe WITHOUT poisoning
    the other rows' span (Spark max() sorts NaN above every number),
    and an all-NULL column quantizes to 0 everywhere as documented."""
    df = spark.createDataFrame(
        [(0.0, None), (50.0, None), (100.0, None), (float("nan"), None)],
        "a double, b double",
    )
    rows = {
        r["a"]: r["__z"] for r in with_zvalue(df, ["a", "b"], bits=8).collect()
    }
    nan_key = next(k for k in rows if k != k)  # NaN != NaN
    assert rows[nan_key] == 0
    assert rows[0.0] == 0
    # span must still be [0,100] → max hits the top stripe
    assert rows[100.0] == ref_morton([255, 0], 8)
    assert 0 < rows[50.0] < rows[100.0]


def _file_stats(path: str, col_idx: dict[str, int]):
    """Per-file (min, max) for the given columns from parquet row-group
    metadata — the exact stats a scan prunes on."""
    out = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins = {c: None for c in col_idx}
        maxs = {c: None for c in col_idx}
        for rg in range(md.num_row_groups):
            for c, i in col_idx.items():
                st = md.row_group(rg).column(i).statistics
                mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
        out.append({c: (mins[c], maxs[c]) for c in col_idx})
    return out


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """On a 128×128 grid written as 16 z-ordered files, a narrow band
    predicate on EITHER dimension must overlap a minority of files —
    while the same data sorted by x alone cannot prune y at all. Also
    a correctness roundtrip: filters over the clustered files return
    exactly the expected rows."""
    n = 128
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, ["x", "y"], n_files=16)
    xpath = str(tmp_path / "xsort")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        xpath
    )

    idx = {"x": 0, "y": 1}
    lo, hi = 8, 23  # a 1/8-wide band

    def overlapping(stats, c):
        return sum(1 for s in stats if s[c][0] <= hi and s[c][1] >= lo)

    zstats = _file_stats(zpath, idx)
    xstats = _file_stats(xpath, idx)
    assert len(zstats) == 16
    # z-order: both dims prune to well under half the files
    assert overlapping(zstats, "x") <= 8
    assert overlapping(zstats, "y") <= 8
    # x-sort: y stats span everything — zero y pruning (the motivation)
    assert overlapping(xstats, "y") == 16

    back = spark.read.parquet(zpath)
    assert back.count() == n * n
    assert (
        back.filter((F.col("x") >= lo) & (F.col("x") <= hi)).count()
        == (hi - lo + 1) * n
    )

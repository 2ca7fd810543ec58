"""Parity queries: the BDB numeric kernels exercised over synthetic
inputs derived deterministically from the driver's tables.

The openness kernel (X1/X2) is irreducibly procedural — no SQL
equivalent — so the driver records rows-only checks here; the real
correctness evidence is tests/test_kernels.py (reference smoke inputs,
interception-equation property, partition-invariance).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.kernels import score_openness
from ..sources.io import load_table
from .registry import query


@query("q90_openness_kernel")  # rows-only: no SQL equivalent (X1/X2)
def q90_openness_kernel(spark, sf_dir):
    """X1+X2 end-to-end: pseudo-tracking rows derived from `events`
    (fully deterministic column transforms), scored by the
    mapInPandas openness kernel at reduced MC density."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    base = (
        e.orderBy("event_id")
        .limit(24)
        .select(
            F.col("user_id").cast("long").alias("gameId"),
            (F.col("event_id") % 10).cast("long").alias("playId"),
            F.col("event_id").cast("long").alias("nflId"),
            (F.col("event_id") % 100).cast("long").alias("frameId"),
            (v % 8 + 2).alias("s"),
            ((v * 7) % 360).alias("dir"),
            (v % 100 + 5).alias("x"),
            (v % 45 + 3).alias("y"),
            F.lit(18.0).alias("ball_speed"),
            (v % 110).alias("fx"),
            (v % 50).alias("fy"),
            F.array(
                F.struct(
                    ((v * 3) % 110).alias("x"),
                    ((v * 3) % 50).alias("y"),
                    F.lit(6.0).alias("s"),
                ),
                F.struct(
                    ((v * 5) % 110).alias("x"),
                    ((v * 5) % 50).alias("y"),
                    F.lit(7.0).alias("s"),
                ),
                F.struct(
                    ((v * 11) % 110).alias("x"),
                    ((v * 11) % 50).alias("y"),
                    F.lit(5.5).alias("s"),
                ),
            ).alias("defenders"),
        )
    )
    return score_openness(base, density=5.0)

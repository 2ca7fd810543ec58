"""Stage 3 — radius_model.R: score openness per route-runner frame and
aggregate by route × coverage × second.

The reference's chunked process pool (50k rows, cores−1 workers,
`radius_model.R:210-255`, X3) disappears: `score_openness` is a
mapInPandas operator and Spark's scheduler is the chunker. The
windowed dense_rank (`:257-261`, W1) and group mean (`:265-268`, A1)
run as ordinary window/agg over the scored output.

Scale: the kernel is embarrassingly parallel — repartition by
(gameId, playId) up front so the subsequent secondId window reuses the
same exchange, then one Arrow round-trip per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import score_openness, wide_to_defender_array
from ..operators.aggregates import group_median
from ..operators.windows import dense_rank_id


def build_radius_data(
    cleaned_player_data: DataFrame, density: float = 100.0
) -> DataFrame:
    """`radius_data` (`radius_model.R:270`): cleaned_player_data +
    open_count + secondId."""
    cpd = wide_to_defender_array(cleaned_player_data)
    kernel_in = cpd.select(
        "gameId", "playId", "nflId", "frameId", "s", "dir", "x", "y",
        F.coalesce(F.col("throw_speed"), F.lit(18.0)).alias("ball_speed"),
        F.coalesce(F.col("fx"), F.col("x")).alias("fx"),
        F.coalesce(F.col("fy"), F.col("y")).alias("fy"),
        "defenders",
    ).repartition("gameId", "playId")
    scored = score_openness(kernel_in, density=density)
    out = cleaned_player_data.join(
        scored, ["gameId", "playId", "nflId", "frameId"], "inner"
    )
    return dense_rank_id(out, ["gameId", "playId"], ["frameId"], "secondId")


def openness_by_route(radius_data: DataFrame) -> DataFrame:
    """`group_by(routeRan, coverage, secondId) %>%
    summarise(mean(open_count, na.rm=T))` (`radius_model.R:265-268`,
    A1 — Spark avg skips nulls natively)."""
    return radius_data.groupBy(
        "routeRan", "pff_defensiveCoverageAssignment", "secondId"
    ).agg(F.avg("open_count").alias("avg_openness"))

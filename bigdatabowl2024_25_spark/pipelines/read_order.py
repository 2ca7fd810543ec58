"""Stage 4 — BuildingReadOrder.R: dropback timing and QB read-order
assignment.

Reference → Spark mapping (all SURVEY.md §2.5):
- physics step `s*0.1 + 0.5*a*0.1²` (`BuildingReadOrder.R:87`, F1)
- per-play running distance (`:88-94`, W2 — decimal-free here: the
  pipeline is not oracle-gated, plain double cumsum)
- first frame crossing dropbackDistance (`:97-106`, W3)
- offset vs group min frame (`:108-111`, W4) → top_drop_frame
- read cadence: firstRead..fifthRead at +0,+5,+10,+15,+20 frames
  (`:116-122`, W11 — 0.5 s per read at 10 Hz)
- receivers at the snap frame (`:128-130`, W5), outside receivers via
  y min/max (`:133-137`, W6), first-read side + argmax openness
  (`:141-146`, W7), read order by conditional sort key (`:151-157`,
  W8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import physics_step
from ..operators.windows import (
    argmax_row,
    filter_to_group_extremes,
    filter_to_group_min,
    first_crossing,
    group_min_offset,
    row_number_by,
    running_sum,
)

PLAY = ["gameId", "playId"]


def dropback_timing(
    tracking: DataFrame, plays: DataFrame, players: DataFrame
) -> DataFrame:
    """(gameId, playId) → firstRead..fifthRead frame offsets
    (`BuildingReadOrder.R:189-195`)."""
    qb_ids = players.filter(F.col("position") == "QB").select("nflId")
    qb = (
        tracking.filter(F.col("frameType") == "AFTER_SNAP")
        .join(F.broadcast(qb_ids), ["nflId"])
        .join(
            F.broadcast(plays.select(*PLAY, "dropbackDistance", "dropbackType")),
            PLAY,
        )
        .filter(
            ~F.col("dropbackType").isin(
                "DESIGNED_ROLLOUT_RIGHT", "DESIGNED_ROLLOUT_LEFT",
                "QB_SNEAK", "DESIGNED_RUN",
            )
        )
    )
    qb = qb.withColumn("distance_step", physics_step(F.col("s"), F.col("a")))
    qb = running_sum(
        qb, PLAY, ["frameId"], "distance_step", "cumulative_distance"
    )
    qb = first_crossing(
        qb,
        PLAY,
        F.col("cumulative_distance") >= F.col("dropbackDistance"),
        "frameId",
        "drop_complete_frame",
    )
    qb = group_min_offset(
        qb, PLAY, "drop_complete_frame", "frameId", "top_drop_frame"
    )
    timing = qb.select(*PLAY, "top_drop_frame").distinct()
    first = F.col("top_drop_frame")
    return timing.select(
        *PLAY,
        first.alias("firstRead"),
        (first + 5).alias("secondRead"),
        (first + 10).alias("thirdRead"),
        (first + 15).alias("fourthRead"),
        (first + 20).alias("fifthRead"),
    )


def _receivers_at_snap(radius_data: DataFrame) -> DataFrame:
    """Route-runner positions at the first AFTER_SNAP frame (W5)."""
    return filter_to_group_min(
        radius_data.select(*PLAY, "nflId", "frameId", "y"), PLAY, "frameId"
    )


def reads_data(radius_data: DataFrame) -> DataFrame:
    """(gameId, playId) → firstTarget..fifthTarget
    (`BuildingReadOrder.R:189`).

    First read: the outside receiver (y at min or max, W6) with the
    highest average openness (W7, ties → lower nflId); remaining reads
    scan across the formation from the first read's side (W8)."""
    snap = _receivers_at_snap(radius_data)
    avg_open = radius_data.groupBy(*PLAY, "nflId").agg(
        F.avg("open_count").alias("avg_openness")
    )
    snap = snap.join(avg_open, [*PLAY, "nflId"])

    outside = filter_to_group_extremes(snap, PLAY, "y")
    w = Window.partitionBy(*PLAY)
    outside = outside.withColumn(
        "firstSide",
        F.when(F.col("y") == F.min("y").over(w), "L").otherwise("R"),
    )
    first = argmax_row(
        outside, PLAY, [F.col("avg_openness").desc(), F.col("nflId").asc()]
    ).select(*PLAY, "firstSide")

    ordered = row_number_by(
        snap.join(F.broadcast(first), PLAY),
        PLAY,
        [
            F.when(F.col("firstSide") == "R", -F.col("y")).otherwise(F.col("y")),
            F.col("nflId"),
        ],
        "read_order",
    )
    tgt = lambda i: F.max(  # noqa: E731
        F.when(F.col("read_order") == i, F.col("nflId"))
    )
    return ordered.groupBy(*PLAY).agg(
        tgt(1).alias("firstTarget"),
        tgt(2).alias("secondTarget"),
        tgt(3).alias("thirdTarget"),
        tgt(4).alias("fourthTarget"),
        tgt(5).alias("fifthTarget"),
    )


def seconds_data(radius_data: DataFrame) -> DataFrame:
    """(gameId, playId, frameId, secondId) (`BuildingReadOrder.R:192`)."""
    return radius_data.select(*PLAY, "frameId", "secondId").distinct()

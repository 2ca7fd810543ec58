"""Matchup Information.R: route-tree × coverage matchup counts with the
mirror join.

- route_tree: receivers' routes concatenated in formation order
  (sorted by y) — ordered string agg (A7, `Matchup
  Information.R:38-41,63-68`), sorted INSIDE the aggregate.
- reversed_route: split/reverse/rejoin (F6, `:75-77`).
- mirror join: matchups ⋈ itself on route_tree == reversed_route
  within the same coverage (J8, `:79-84`); unmatched mirrors get 0
  (J11, `:86`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import reverse_words
from ..operators.aggregates import ordered_string_agg
from ..operators.relational import mirror_self_join

PLAY = ["gameId", "playId"]


def route_trees(
    tracking: DataFrame, plays: DataFrame, player_play: DataFrame
) -> DataFrame:
    """Per-play route tree: routes of the route runners ordered by
    their y position at the snap frame."""
    runners = player_play.filter(F.col("wasRunningRoute")).select(
        *PLAY, "nflId", "routeRan"
    )
    snap_pos = (
        tracking.filter(F.col("frameType") == "AFTER_SNAP")
        .groupBy(*PLAY, "nflId")
        .agg(F.min_by("y", "frameId").alias("y_snap"))
    )
    j = runners.join(snap_pos, [*PLAY, "nflId"]).join(
        F.broadcast(plays.select(*PLAY, "pff_passCoverage")), PLAY
    )
    return ordered_string_agg(
        j,
        [*PLAY, "pff_passCoverage"],
        order_col="y_snap",
        value="routeRan",
        out="route_tree",
    )


def matchup_counts(route_trees_df: DataFrame) -> DataFrame:
    """`group_by(route_tree, coverage) %>% summarise(matchups = n())`
    (A3, `Matchup Information.R:45-46`) + mirror-augmented counts."""
    m = route_trees_df.groupBy("route_tree", "pff_passCoverage").agg(
        F.count("*").alias("matchups")
    )
    m = m.withColumn("reversed_route", reverse_words(F.col("route_tree")))
    mirrored = mirror_self_join(
        m,
        left_col="reversed_route",
        right_col="route_tree",
        extra_keys=["pff_passCoverage"],
        payload=["matchups"],
    )
    return mirrored.select(
        "route_tree",
        "pff_passCoverage",
        "matchups",
        F.coalesce(F.col("matchups_m"), F.lit(0)).alias("mirror_matchups"),
    ).withColumn(
        "total_matchups", F.col("matchups") + F.col("mirror_matchups")
    )

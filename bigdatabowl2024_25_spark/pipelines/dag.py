"""The full five-stage DAG with materialized parquet stage tables.

The reference links its scripts through SQLite tables — each stage
persists its output and the next stage reads it back
(`Openness_Data_Frame_Prep.R:101` → `radius_model.R:201-203` →
`BuildingReadOrder.R:8-11` → `QBReadStats.R:20-42`). This runner keeps
that materialized-pipeline architecture (stage tables are
checkpoints: the radius stage costs hours at full scale and must be
restartable), swapping SQLite for partitioned parquet.

Stage tables are partitioned by gameId — at 100 TB the frame-level
tables are play-local, so downstream per-play windows and joins read
only the partitions they touch, and a failed downstream stage restarts
without recomputing the kernel stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import write_table
from . import matchup, openness_prep, qb_stats, radius_stage, read_order


def run_dag(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    out_dir: str,
    density: float = 100.0,
) -> dict[str, DataFrame]:
    """Execute clean → openness-prep → radius → read-order → qb-stats
    (+ matchups), materializing every stage table under `out_dir` and
    reading it back before the next stage consumes it.

    `tables` needs: tracking, plays, players, player_play.
    Returns the stage DataFrames (read back from parquet).
    """
    t, plays = tables["tracking"], tables["plays"]
    players, player_play = tables["players"], tables["player_play"]
    out: dict[str, DataFrame] = {}

    def stage(name: str, df: DataFrame, partition_by=("gameId",)) -> DataFrame:
        write_table(df, f"{out_dir}/{name}", partition_by=list(partition_by))
        out[name] = spark.read.parquet(f"{out_dir}/{name}")
        return out[name]

    cpd = stage(
        "cleaned_player_data",
        openness_prep.build_cleaned_player_data(t, plays, players, player_play),
    )
    radius = stage(
        "radius_data", radius_stage.build_radius_data(cpd, density=density)
    )
    stage("reads_data", read_order.reads_data(radius))
    stage("seconds_data", read_order.seconds_data(radius))
    timing = stage(
        "dropback_timing", read_order.dropback_timing(t, plays, players)
    )
    reads = qb_stats.play_reads(
        t, plays, player_play, players, timing, out["reads_data"]
    )
    stage("press_data", qb_stats.press_data(reads), partition_by=())
    trees = matchup.route_trees(t, plays, player_play)
    stage("matchups", matchup.matchup_counts(trees), partition_by=())
    return out

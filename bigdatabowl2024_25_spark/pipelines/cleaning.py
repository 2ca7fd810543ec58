"""Stage 1 — DataCleaning.R: union the 9 tracking week files and
attach play context.

Spark-first: the per-file `rbind` loop (`DataCleaning.R:20`) is a
globbed scan (S2) upstream; here the remaining work is one broadcast
join. plays is dim-sized (16k rows) → tracking (59M rows) never
shuffles."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import dim_join, union_all


def clean_tracking(
    tracking_weeks: list[DataFrame] | DataFrame, plays: DataFrame
) -> DataFrame:
    """`rbind(w1..w9) %>% merge(plays, by=c("gameId","playId"))`
    (`DataCleaning.R:20-22`)."""
    tracking = (
        union_all(*tracking_weeks)
        if isinstance(tracking_weeks, list)
        else tracking_weeks
    )
    return dim_join(tracking, plays, on=["gameId", "playId"], how="inner")

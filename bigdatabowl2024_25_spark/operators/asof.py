"""As-of (nearest-preceding) join — the time-series alignment operator
Spark lacks natively.

The BDB analogue: align each tracking frame with the most recent
event row (snap, pass_forward) at or before it — the reference does
this with per-play event scans (`Openness_Data_Frame_Prep.R:70-74`);
generic engines expose it as ASOF JOIN (DuckDB, QuestDB, kdb).

Spark-first implementation: union-then-window, NOT a range join —
tag both sides, sort each key group by (order, side), and carry the
right side's payload forward with last(ignorenulls) over an unbounded
preceding frame. Cost is one shuffle on the key + an in-partition
sort: O(n log n), no candidate-pair blowup, no skew amplification
(a hot key costs what sorting its rows costs). The range-join
formulation (l ⋈ r on key ∧ r.t ≤ l.t, then argmax r.t) explodes to
O(|l|·|r|) per key before pruning — never acceptable at 100 TB.

Tie semantics match DuckDB `ASOF JOIN ... ON l.t >= r.t`: a right row
at exactly l.t matches (right sorts before left on equal timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    order_col: str,
    payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row gains the `payload` columns of
    the latest right row with the same `keys` and right.order_col <=
    left.order_col (null if none). Left must not already contain the
    suffixed payload names."""
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"{p}{suffix}")
          for p in payload],
    )
    r = right.select(
        *[
            F.col(c)
            if c in keys or c == order_col
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(p).alias(f"{p}{suffix}") for p in payload],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        *lcols,
        F.col("__side"),
        *[
            F.last(f"{p}{suffix}", ignorenulls=True).over(w).alias(f"{p}{suffix}")
            for p in payload
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")

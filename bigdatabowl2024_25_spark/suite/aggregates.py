"""Parity queries: aggregations (SURVEY.md §2.4, A2-A12).

A1/A4 are exercised by q01-q03 in relational.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.aggregates import (
    conditional_count,
    first_last_by,
    group_median,
    multi_stat,
    pivot_wide,
    row_sum,
)
from ..sources.io import load_table
from .registry import query
from .stable import (
    DEC12,
    davg,
    dstddev_samp,
    oracle_davg,
    oracle_dstddev_samp,
)


@query(
    "q40_median_quantity",
    oracle="""
    SELECT l_returnflag, MEDIAN(l_quantity) AS med_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q40_median_quantity(spark, sf_dir):
    """A2: `median(s, na.rm=TRUE)` per QB
    (`Openness_Data_Frame_Prep.R:87-88`). Exact median for oracle
    parity; at 100 TB the consumer would opt into percentile_approx."""
    l = load_table(spark, sf_dir, "lineitem")
    return group_median(l, ["l_returnflag"], "l_quantity", "med_qty")


@query(
    "q41_price_stats",
    oracle=f"""
    SELECT o_orderpriority,
           {oracle_davg('o_totalprice', 'price_mean')},
           {oracle_dstddev_samp('o_totalprice', 'price_std')},
           MIN(o_totalprice) AS price_min,
           MAX(o_totalprice) AS price_max,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def q41_price_stats(spark, sf_dir):
    """A5: pandas multi-stat agg mean/std/nunique/min/max
    (`DefCoverage.ipynb` cell 2; `DefPosModel.ipynb` cell 1). pandas
    std = sample stddev; computed from exact decimal moment sums for
    engine parity."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        davg("o_totalprice", "price_mean"),
        dstddev_samp("o_totalprice", "price_std"),
        F.min("o_totalprice").alias("price_min"),
        F.max("o_totalprice").alias("price_max"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@query(
    "q42_start_end_value",
    oracle="""
    SELECT user_id,
           MIN_BY(value, epoch_us(ts)) AS start_value,
           MAX_BY(value, epoch_us(ts)) AS end_value
    FROM events GROUP BY user_id
    """,
)
def q42_start_end_value(spark, sf_dir):
    """A6: `.agg(start_x=('x','first'), end_x=('x','last'))` after frame
    sort (`DefPosModel.ipynb` cell 1 defender_start_end) — min_by/max_by:
    one hash aggregate with map-side partials, no window, no sort."""
    e = load_table(spark, sf_dir, "events")
    return first_last_by(e, ["user_id"], "ts_us", "value")


@query(
    "q43_event_tree",
    oracle="""
    SELECT user_id, epoch_us(ts) // 86400000000 AS day,
           STRING_AGG(event_type, ' ' ORDER BY epoch_us(ts), event_id)
             AS event_tree
    FROM events GROUP BY user_id, epoch_us(ts) // 86400000000
    """,
)
def q43_event_tree(spark, sf_dir):
    """A7: ordered string agg — `summarise(route_tree = paste(routeRan,
    collapse=" "))` with explicit pre-sort (`Matchup
    Information.R:38-41,63-68`). Sort happens INSIDE the aggregate
    (array_sort of (key,value) structs): bare collect_list order is
    nondeterministic under repartitioning."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.expr("ts_us div 86400000000")
    )
    return e.groupBy("user_id", "day").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts_us"), F.col("event_id"), F.col("event_type")
                        )
                    )
                ),
                lambda s: s["event_type"],
            ),
            " ",
        ).alias("event_tree")
    )


@query(
    "q44_status_pivot",
    oracle="""
    SELECT c_nationkey,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def q44_status_pivot(spark, sf_dir):
    """A8: long→wide pivot with explicit values + zero-fill —
    `pivot_wider(names_from=defLabel, values_from=(x,y,s))`
    (`Openness_Data_Frame_Prep.R:38-43`), pandas `pivot_table(...,
    fill_value=0)` (`DefCoverage.ipynb` cell 3). Explicit pivot values
    skip Spark's distinct-values pre-job — a full extra scan at scale."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    j = o.join(F.broadcast(c), ["o_custkey"])
    return pivot_wide(
        j,
        ids=["c_nationkey"],
        pivot_col="o_orderstatus",
        pivot_values=["F", "O", "P"],
        aggs=[F.count(F.lit(1))],
        fill=0,
    )


@query(
    "q45_event_entropy",
    oracle=f"""
    WITH counts AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY user_id, event_type
    ), probs AS (
        SELECT user_id,
               CAST(n AS DOUBLE) /
                 SUM(CAST(n AS DOUBLE)) OVER (PARTITION BY user_id) AS p
        FROM counts
    )
    SELECT user_id, ROUND(-SUM(p * LOG2(p)), 6) AS entropy
    FROM probs GROUP BY user_id
    """,
)
def q45_event_entropy(spark, sf_dir):
    """A11: normalized-count Shannon entropy (`QBReadStats.R:330-341`).

    Determinism note: log2 is transcendental — Spark (JVM) and DuckDB
    (libm) can disagree in the last ulp, so decimal-casting the addends
    would just move the coin-flip to the decimal rounding boundary.
    Instead the FINAL entropy is rounded to 6 decimals on both sides:
    a 1-ulp input wiggle flips that rounding with probability ~1e-9.
    (The per-user totals are integer-valued doubles, so their window
    sum is exact regardless of association order.)"""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id")
    p = F.col("n").cast("double") / F.sum(F.col("n").cast("double")).over(w)
    return (
        counts.withColumn("p", p)
        .groupBy("user_id")
        .agg(F.round(-F.sum(F.col("p") * F.log2("p")), 6).alias("entropy"))
    )


@query(
    "q46_high_value_rate",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(CASE WHEN o_totalprice > 150000 THEN 1 END) AS BIGINT)
             AS n_high,
           COUNT(*) AS n,
           CAST(COUNT(CASE WHEN o_totalprice > 150000 THEN 1 END) AS DOUBLE)
             / COUNT(*) AS high_rate
    FROM orders GROUP BY o_orderpriority
    """,
)
def q46_high_value_rate(spark, sf_dir):
    """A4/A12: ratio-of-aggregates per group —
    `sum(is_expected_receiver)/n()` (`QBReadStats.R:142-144`)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        conditional_count(F.col("o_totalprice") > 150000, "n_high"),
        F.count("*").alias("n"),
        (
            F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)).cast(
                "double"
            )
            / F.count("*")
        ).alias("high_rate"),
    )


@query(
    "q47_row_sum",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(l_quantity, 0) + COALESCE(l_discount, 0)
             + COALESCE(l_tax, 0) AS parts_sum
    FROM lineitem
    """,
)
def q47_row_sum(spark, sf_dir):
    """A10: horizontal `rowSums(data[, 5:22])` (`cover_threshold.R:11`)
    — a fixed left-to-right chain of per-row double adds, deterministic
    on both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        row_sum(["l_quantity", "l_discount", "l_tax"], "parts_sum"),
    )


@query(
    "q48_global_stats",
    oracle=f"""
    SELECT {oracle_davg('o_totalprice', 'price_mean')},
           {oracle_dstddev_samp('o_totalprice', 'price_std')},
           COUNT(*) AS n
    FROM orders
    """,
)
def q48_global_stats(spark, sf_dir):
    """A9: global aggregates + coefficient-of-variation inputs
    (`QBReadStats.R:157,220,344-345`)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        davg("o_totalprice", "price_mean"),
        dstddev_samp("o_totalprice", "price_std"),
        F.count("*").alias("n"),
    )


@query(
    "q49_price_stats_wide",
    oracle=f"""
    SELECT o_orderstatus,
           {oracle_davg('o_totalprice', 'totalprice_mean')},
           {oracle_dstddev_samp('o_totalprice', 'totalprice_std')},
           MIN(o_totalprice) AS totalprice_min,
           MAX(o_totalprice) AS totalprice_max,
           COUNT(o_totalprice) AS totalprice_count
    FROM orders GROUP BY o_orderstatus
    """,
)
def q49_price_stats_wide(spark, sf_dir):
    """A5 via the reusable multi_stat operator (decimal-stable variant
    of mean/std wired in below for parity)."""
    o = load_table(spark, sf_dir, "orders")
    out = multi_stat(o, ["o_orderstatus"], "o_totalprice", prefix="totalprice")
    # swap the double mean/std for the decimal-stable versions
    return (
        out.drop("totalprice_mean", "totalprice_std")
        .join(
            o.groupBy("o_orderstatus").agg(
                davg("o_totalprice", "totalprice_mean"),
                dstddev_samp("o_totalprice", "totalprice_std"),
            ),
            ["o_orderstatus"],
        )
    )


@query(
    "q32_unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, value FROM (
        UNPIVOT (
            SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
            FROM lineitem WHERE l_orderkey < 100
        )
        ON l_quantity, l_discount, l_tax
        INTO NAME measure VALUE value
    )
    """,
)
def q32_unpivot_measures(spark, sf_dir):
    """Unpivot/melt — the inverse of the A8 wide pivot (the reference
    melts via per-row dynamic column indexing, F13): three measure
    columns to (measure, value) rows, pure narrow transform, no
    shuffle."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 100
    )
    return l.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "value",
    )

"""Parity queries: aggregations (SURVEY.md §2.4, A2-A12).

A1/A4 are exercised by q01-q03 in relational.py.

Consolidation note (round 2): the driver records at most 50 parity
queries, so round 1's one-operator-per-query layout is folded into
multi-operator queries (COVERAGE.md has the operator→query map):
- q41 now carries A5 multi-stat + A4/A12 conditional-ratio + A9 global
  aggregates in ONE rollup pass (the global row comes free from the
  grouping-set expansion — strictly less work than round 1's three
  separate scans).
- q42 joins the per-user A6 first/last profile with the A11 entropy
  profile on user_id (both branches shuffle once on user_id).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.aggregates import (
    conditional_count,
    first_last_by,
    group_median,
    pivot_wide,
    row_sum,
)
from ..sources.io import load_table
from .registry import query
from .stable import (
    davg,
    dstddev_samp,
    oracle_davg,
    oracle_dstddev_samp,
)


@query(
    "q40_median_quantity",
    oracle="""
    WITH med AS (
        SELECT l_returnflag, MEDIAN(l_quantity) AS med
        FROM lineitem GROUP BY 1
    ),
    madt AS (
        SELECT l.l_returnflag,
               MEDIAN(ABS(l.l_quantity - m.med)) AS mad
        FROM lineitem l JOIN med m USING (l_returnflag) GROUP BY 1
    )
    SELECT 'med' AS kind, l_returnflag, med AS med_qty FROM med
    UNION ALL
    SELECT 'mad', l_returnflag, mad FROM madt
    UNION ALL
    SELECT 'madout', l.l_returnflag, CAST(COUNT(*) AS DOUBLE)
    FROM lineitem l
    JOIN med m USING (l_returnflag)
    JOIN madt d USING (l_returnflag)
    WHERE 2 * ABS(l.l_quantity - m.med) > 3 * d.mad
    GROUP BY l.l_returnflag
    """,
)
def q40_median_quantity(spark, sf_dir):
    """A2: `median(s, na.rm=TRUE)` per QB
    (`Openness_Data_Frame_Prep.R:87-88`). Exact median for oracle
    parity; at 100 TB the consumer would opt into percentile_approx.

    'mad'/'madout' (round 10): the robust-stats extension
    (`aggregates.mad_outliers`) — per-flag MAD and the count of
    2·|x − median| > 3·MAD (c = 1.5 — uniform quantities have no 3-MAD tail, the flag must actually fire) outliers; flag membership is engine-exact
    IEEE arithmetic on the q40-proven exact medians."""
    from ..operators.aggregates import mad_outliers

    l = load_table(spark, sf_dir, "lineitem")
    med = group_median(l, ["l_returnflag"], "l_quantity", "med_qty").select(
        F.lit("med").alias("kind"), "l_returnflag", "med_qty"
    )
    flagged = mad_outliers(
        l, ["l_returnflag"], "l_quantity", c_num=3, c_den=2
    )
    mad = (
        flagged.groupBy("l_returnflag")
        .agg(F.first("__mad").alias("med_qty"))
        .select(F.lit("mad").alias("kind"), "l_returnflag", "med_qty")
    )
    madout = (
        flagged.filter(F.col("is_mad_outlier"))
        .groupBy("l_returnflag")
        .agg(F.count("*").cast("double").alias("med_qty"))
        .select(F.lit("madout").alias("kind"), "l_returnflag", "med_qty")
    )
    return med.unionByName(mad).unionByName(madout)


@query(
    "q41_priority_price_profile",
    oracle=f"""
    SELECT COALESCE(o_orderpriority, '<all>') AS o_orderpriority,
           {oracle_davg('o_totalprice', 'price_mean')},
           {oracle_dstddev_samp('o_totalprice', 'price_std')},
           MIN(o_totalprice) AS price_min,
           MAX(o_totalprice) AS price_max,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(COUNT(CASE WHEN o_totalprice > 150000 THEN 1 END) AS BIGINT)
             AS n_high,
           COUNT(*) AS n,
           CAST(COUNT(CASE WHEN o_totalprice > 150000 THEN 1 END) AS DOUBLE)
             / COUNT(*) AS high_rate
    FROM orders GROUP BY ROLLUP (o_orderpriority)
    """,
)
def q41_priority_price_profile(spark, sf_dir):
    """A5 pandas-style multi-stat agg mean/std/nunique/min/max
    (`DefCoverage.ipynb` cell 2) + A4/A12 conditional-count ratio
    `sum(is_expected_receiver)/n()` (`QBReadStats.R:142-144`) + A9
    global aggregates (`QBReadStats.R:157,344-345`) — one
    ROLLUP(o_orderpriority) pass: the '<all>' row IS the global
    aggregate, expanded from the same shuffle (no second scan). pandas
    std = sample stddev, computed from exact decimal moment sums.
    Round 6: absorbed q49 (same A5 stats via the `multi_stat`
    operator, which stays pytest-covered in test_aggregates)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority")
        .agg(
            davg("o_totalprice", "price_mean"),
            dstddev_samp("o_totalprice", "price_std"),
            F.min("o_totalprice").alias("price_min"),
            F.max("o_totalprice").alias("price_max"),
            F.countDistinct("o_custkey").alias("n_customers"),
            conditional_count(F.col("o_totalprice") > 150000, "n_high"),
            F.count("*").alias("n"),
            (
                F.sum(
                    F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)
                ).cast("double")
                / F.count("*")
            ).alias("high_rate"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias(
                "o_orderpriority"
            ),
            "price_mean",
            "price_std",
            "price_min",
            "price_max",
            "n_customers",
            "n_high",
            "n",
            "high_rate",
        )
    )


@query(
    "q42_user_value_profile",
    oracle=f"""
    WITH se AS (
        SELECT user_id,
               MIN_BY(value, epoch_us(ts)) AS start_value,
               MAX_BY(value, epoch_us(ts)) AS end_value
        FROM events GROUP BY user_id
    ),
    counts AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY user_id, event_type
    ), probs AS (
        SELECT user_id,
               CAST(n AS DOUBLE) /
                 SUM(CAST(n AS DOUBLE)) OVER (PARTITION BY user_id) AS p
        FROM counts
    ), ent AS (
        SELECT user_id, ROUND(-SUM(p * LOG2(p)), 6) AS entropy
        FROM probs GROUP BY user_id
    )
    , cr_e AS (
        SELECT user_id AS u, epoch_us(ts) // 604800000000 AS b
        FROM events
    ),
    cr_first AS (SELECT u, MIN(b) AS cohort FROM cr_e GROUP BY 1),
    cr_act AS (SELECT DISTINCT u, b FROM cr_e),
    cohorts AS (
        SELECT cohort, b - cohort AS k, COUNT(DISTINCT u) AS n_users
        FROM cr_act JOIN cr_first USING (u) GROUP BY 1, 2
    )
    , trend AS (
        SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x*y) AS sxy, SUM(x*x) AS sxx
        FROM (
            SELECT user_id,
                   CAST(tu - MIN(tu) OVER (PARTITION BY user_id)
                        AS HUGEINT) AS x,
                   CAST(FLOOR(value * 1000000.0) AS HUGEINT) AS y
            FROM (SELECT user_id, epoch_us(ts) // 1000000 AS tu, value
                  FROM events)
            WHERE value IS NOT NULL AND tu IS NOT NULL
        ) GROUP BY user_id
    )
    SELECT 'profile' AS kind, se.user_id, se.start_value, se.end_value,
           ent.entropy, CAST(NULL AS BIGINT) AS cohort,
           CAST(NULL AS BIGINT) AS k, CAST(NULL AS BIGINT) AS n_users
    FROM se JOIN ent ON ent.user_id = se.user_id
    UNION ALL
    SELECT 'cohort', NULL, NULL, NULL, NULL, cohort, k, n_users
    FROM cohorts
    UNION ALL
    SELECT 'trend', user_id, NULL, NULL, NULL,
           CAST(CASE WHEN n*sxx - sx*sx > 0
                THEN (n*sxy - sx*sy) // (n*sxx - sx*sx) END AS BIGINT),
           NULL, CAST(n AS BIGINT)
    FROM trend
    """,
)
def q42_user_value_profile(spark, sf_dir):
    """A6 first/last in frame order via min_by/max_by
    (`DefPosModel.ipynb` cell 1 defender_start_end — one hash aggregate
    with map-side partials, no window, no sort) joined with A11
    normalized-count Shannon entropy (`QBReadStats.R:330-341`).

    Entropy determinism: log2 is transcendental — Spark (JVM) and
    DuckDB (libm) can disagree in the last ulp, so the FINAL entropy is
    rounded to 6 decimals on both sides; the per-user totals are
    integer-valued doubles, so their window sum is exact regardless of
    association order."""
    e = load_table(spark, sf_dir, "events")
    se = first_last_by(e, ["user_id"], "ts_us", "value")
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id")
    p = F.col("n").cast("double") / F.sum(F.col("n").cast("double")).over(w)
    ent = (
        counts.withColumn("p", p)
        .groupBy("user_id")
        .agg(F.round(-F.sum(F.col("p") * F.log2("p")), 6).alias("entropy"))
    )
    nb = F.lit(None).cast("bigint")
    profile = se.join(ent, ["user_id"]).select(
        F.lit("profile").alias("kind"),
        "user_id",
        "start_value",
        "end_value",
        "entropy",
        nb.alias("cohort"),
        nb.alias("k"),
        nb.alias("n_users"),
    )
    # 'cohort' (round 9): `funnel.cohort_retention` — weekly cohorts
    # by first activity, distinct-user retention per offset week;
    # oracle mirrors with two aggregates + a join.
    from ..operators.funnel import cohort_retention

    cohorts = cohort_retention(e, "user_id", "ts_us", 604_800_000_000)
    nd = F.lit(None).cast("double")
    cohort_rows = cohorts.select(
        F.lit("cohort").alias("kind"),
        nb.alias("user_id"),
        nd.alias("start_value"),
        nd.alias("end_value"),
        nd.alias("entropy"),
        "cohort",
        "k",
        "n_users",
    )

    # 'trend' (round 10): `aggregates.group_trend` — exact per-user
    # least-squares slope of value over time from integer moment sums
    # (micro-value-units per second; div truncation agrees across
    # engines incl. negatives — verified: DuckDB // truncates toward
    # zero like Spark div). Rides one groupBy; slope lands in the
    # `cohort` bigint slot, n in `n_users`.
    from ..operators.aggregates import group_trend

    trend_rows = group_trend(e, ["user_id"], "ts_us", "value").select(
        F.lit("trend").alias("kind"),
        "user_id",
        nd.alias("start_value"),
        nd.alias("end_value"),
        nd.alias("entropy"),
        F.col("slope_micro").alias("cohort"),
        nb.alias("k"),
        F.col("n").alias("n_users"),
    )
    return profile.unionByName(cohort_rows).unionByName(trend_rows)


@query(
    "q43_event_tree",
    oracle="""
    WITH f0 AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t0
        FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    f1 AS (
        SELECT e.user_id, MIN(epoch_us(ts)) AS t1
        FROM events e JOIN f0 ON f0.user_id = e.user_id
        WHERE e.event_type = 'click' AND epoch_us(ts) > f0.t0
        GROUP BY 1
    ),
    f2 AS (
        SELECT e.user_id, MIN(epoch_us(ts)) AS t2
        FROM events e JOIN f1 ON f1.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(ts) > f1.t1
        GROUP BY 1
    )
    SELECT 'tree' AS kind, user_id, epoch_us(ts) // 86400000000 AS day,
           STRING_AGG(event_type, ' ' ORDER BY epoch_us(ts), event_id)
             AS event_tree,
           CAST(NULL AS BIGINT) AS t0, CAST(NULL AS BIGINT) AS t1,
           CAST(NULL AS BIGINT) AS t2, CAST(NULL AS INT) AS reached
    FROM events GROUP BY user_id, epoch_us(ts) // 86400000000
    UNION ALL
    SELECT 'funnel', f0.user_id, NULL, NULL, f0.t0, f1.t1, f2.t2,
           CAST(1 + CASE WHEN f1.t1 IS NOT NULL THEN 1 ELSE 0 END
                  + CASE WHEN f2.t2 IS NOT NULL THEN 1 ELSE 0 END AS INT)
    FROM f0
    LEFT JOIN f1 ON f1.user_id = f0.user_id
    LEFT JOIN f2 ON f2.user_id = f0.user_id
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
    nb = F.lit(None).cast("bigint")
    tree = e.groupBy("user_id", "day").agg(
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
    ).select(
        F.lit("tree").alias("kind"),
        "user_id",
        "day",
        "event_tree",
        nb.alias("t0"),
        nb.alias("t1"),
        nb.alias("t2"),
        F.lit(None).cast("int").alias("reached"),
    )
    # 'funnel' (round 9): `funnel.funnel_steps` — the ordered
    # view→click→purchase recurrence (the read-order generalization);
    # every step anchors on the previous step's min timestamp, oracle
    # mirrors with a chain of min-aggregate CTEs.
    from ..operators.funnel import funnel_steps

    fun = funnel_steps(
        e, "user_id", "ts_us", "event_type", ["view", "click", "purchase"]
    ).select(
        F.lit("funnel").alias("kind"),
        "user_id",
        nb.alias("day"),
        F.lit(None).cast("string").alias("event_tree"),
        "t0",
        "t1",
        "t2",
        "reached",
    )
    return tree.unionByName(fun)


@query(
    "q32_unpivot_measures",
    oracle="""
    SELECT 'melt' AS kind, l_orderkey AS k1,
           CAST(l_linenumber AS BIGINT) AS k2, row_total, measure, value
    FROM (
        UNPIVOT (
            SELECT l_orderkey, l_linenumber,
                   0.0 + COALESCE(l_quantity, 0.0)
                       + COALESCE(l_discount, 0.0)
                       + COALESCE(l_tax, 0.0) AS row_total,
                   l_quantity, l_discount, l_tax
            FROM lineitem WHERE l_orderkey < 100
        )
        ON l_quantity, l_discount, l_tax
        INTO NAME measure VALUE value
    )
    UNION ALL
    SELECT 'pivot' AS kind, CAST(k.c_nationkey AS BIGINT) AS k1,
           CAST(NULL AS BIGINT) AS k2, CAST(NULL AS DOUBLE) AS row_total,
           v.measure, CAST(COALESCE(cnt.n, 0) AS DOUBLE) AS value
    FROM (SELECT DISTINCT c_nationkey
          FROM orders JOIN customer ON o_custkey = c_custkey) k
    CROSS JOIN (VALUES ('F'), ('O'), ('P')) v(measure)
    LEFT JOIN (SELECT c_nationkey, o_orderstatus, COUNT(*) AS n
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY c_nationkey, o_orderstatus) cnt
      ON cnt.c_nationkey = k.c_nationkey AND cnt.o_orderstatus = v.measure
    """,
)
def q32_unpivot_measures(spark, sf_dir):
    """Pivot/unpivot pair in one query.

    'melt' branch — unpivot/melt, the inverse of the A8 wide pivot
    (the reference melts via per-row dynamic column indexing, F13):
    three measure columns to (measure, value) rows, pure narrow
    transform, no shuffle. Carries A10's horizontal row sum
    (`rowSums(data[, 5:22])`, `cover_threshold.R:11`) as the
    row_total id column.

    'pivot' branch (absorbed q44, round 6) — A8 long→wide pivot with
    explicit values + zero-fill — `pivot_wider(names_from=defLabel,
    values_from=(x,y,s))` (`Openness_Data_Frame_Prep.R:38-43`), pandas
    `pivot_table(..., fill_value=0)` (`DefCoverage.ipynb` cell 3).
    Explicit pivot values skip Spark's distinct-values pre-job — a
    full extra scan at scale. The wide result is melted back to the
    shared (kind,k1,k2,row_total,measure,value) schema, so the driver
    hash checks the pivot's zero-filled cells exactly."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 100
    )
    melt = (
        l.select(
            "l_orderkey",
            "l_linenumber",
            row_sum(["l_quantity", "l_discount", "l_tax"], "row_total"),
            "l_quantity",
            "l_discount",
            "l_tax",
        )
        .unpivot(
            ["l_orderkey", "l_linenumber", "row_total"],
            ["l_quantity", "l_discount", "l_tax"],
            "measure",
            "value",
        )
        .select(
            F.lit("melt").alias("kind"),
            F.col("l_orderkey").alias("k1"),
            F.col("l_linenumber").cast("bigint").alias("k2"),
            "row_total",
            "measure",
            "value",
        )
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    j = o.join(F.broadcast(c), ["o_custkey"])
    wide = pivot_wide(
        j,
        ids=["c_nationkey"],
        pivot_col="o_orderstatus",
        pivot_values=["F", "O", "P"],
        aggs=[F.count(F.lit(1))],
        fill=0,
    )
    pivot = wide.unpivot(
        ["c_nationkey"], ["F", "O", "P"], "measure", "value"
    ).select(
        F.lit("pivot").alias("kind"),
        F.col("c_nationkey").cast("bigint").alias("k1"),
        F.lit(None).cast("bigint").alias("k2"),
        F.lit(None).cast("double").alias("row_total"),
        "measure",
        F.col("value").cast("double").alias("value"),
    )
    return melt.unionByName(pivot)

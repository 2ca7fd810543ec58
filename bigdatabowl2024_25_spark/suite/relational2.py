"""Parity queries: remaining join/source variants (J3, J5, J6, J10,
S5) not already covered by relational.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.merge import (
    latest_changes,
    merge_into,
    scd2_build,
    snapshot_diff,
)
from ..operators.relational import asym_join
from ..sources.io import load_table, register_views
from .registry import query
from .stable import dsum, oracle_dsum


@query(
    "q14_asym_key_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    """,
)
def q14_asym_key_join(spark, sf_dir):
    """J3: equi-join on differently-named keys — route runner ⋈
    assigned defender via nflId = pff_primaryDefensiveCoverageMatchupNflId
    (`Openness_Data_Frame_Prep.R:63`). The right-side key column is
    dropped post-join (P2 `data[,-c(19,20)]`)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    c = load_table(spark, sf_dir, "customer")
    out = asym_join(
        e.select("event_id", "user_id"),
        c.select("c_custkey", "c_name", "c_mktsegment"),
        [("user_id", "c_custkey")],
    )
    return out.select("event_id", "user_id", "c_name", "c_mktsegment")


@query(
    "q15_left_join_cascade",
    oracle="""
    WITH urgent AS (SELECT o_custkey, COUNT(*) AS n_urgent FROM orders
                    WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
    high AS (SELECT o_custkey, COUNT(*) AS n_high FROM orders
             WHERE o_orderpriority = '2-HIGH' GROUP BY o_custkey),
    fin AS (SELECT o_custkey, COUNT(*) AS n_finished FROM orders
            WHERE o_orderstatus = 'F' GROUP BY o_custkey),
    open_o AS (SELECT o_custkey, COUNT(*) AS n_open FROM orders
               WHERE o_orderstatus = 'O' GROUP BY o_custkey),
    big AS (SELECT o_custkey, COUNT(*) AS n_big FROM orders
            WHERE o_totalprice > 200000 GROUP BY o_custkey)
    SELECT 'cascade' AS kind, c.c_custkey, CAST(NULL AS VARCHAR) AS c_name,
           COALESCE(u.n_urgent, 0) AS n_urgent,
           COALESCE(h.n_high, 0) AS n_high,
           COALESCE(f.n_finished, 0) AS n_finished,
           COALESCE(op.n_open, 0) AS n_open,
           COALESCE(b.n_big, 0) AS n_big,
           CAST(NULL AS BIGINT) AS o_orderkey
    FROM customer c
    LEFT JOIN urgent u ON u.o_custkey = c.c_custkey
    LEFT JOIN high h ON h.o_custkey = c.c_custkey
    LEFT JOIN fin f ON f.o_custkey = c.c_custkey
    LEFT JOIN open_o op ON op.o_custkey = c.c_custkey
    LEFT JOIN big b ON b.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'right' AS kind, c.c_custkey, c.c_name,
           NULL, NULL, NULL, NULL, NULL, o.o_orderkey
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey IS NULL OR o.o_orderpriority = '5-LOW'
    """,
)
def q15_left_join_cascade(spark, sf_dir):
    """J5: five sequential left joins building first…fifth targets
    (`BuildingReadOrder.R:174-178`) — here five per-customer order
    aggregates, null-filled to 0 (J11 pattern). Round 6 absorbed q16
    as the 'right' branch: J6 `merge(..., all.y=T)` (`QBReadStats.R:47`)
    — an explicit right outer join keeping unmatched customers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders")

    def side(cond, name):
        return (
            o.filter(cond)
            .groupBy(F.col("o_custkey").alias("c_custkey"))
            .agg(F.count("*").alias(name))
        )

    out = c
    slices = [
        (F.col("o_orderpriority") == "1-URGENT", "n_urgent"),
        (F.col("o_orderpriority") == "2-HIGH", "n_high"),
        (F.col("o_orderstatus") == "F", "n_finished"),
        (F.col("o_orderstatus") == "O", "n_open"),
        (F.col("o_totalprice") > 200000, "n_big"),
    ]
    for cond, name in slices:
        out = out.join(F.broadcast(side(cond, name)), ["c_custkey"], "left")
    cascade = out.select(
        F.lit("cascade").alias("kind"),
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        *[F.coalesce(F.col(n), F.lit(0)).alias(n) for _, n in slices],
        F.lit(None).cast("bigint").alias("o_orderkey"),
    )
    cfull = load_table(spark, sf_dir, "customer")
    j = o.join(cfull, o.o_custkey == cfull.c_custkey, "right")
    right = (
        j.filter(
            F.col("o_orderkey").isNull()
            | (F.col("o_orderpriority") == "5-LOW")
        )
        .select(
            F.lit("right").alias("kind"),
            "c_custkey",
            "c_name",
            *[F.lit(None).cast("bigint").alias(n) for _, n in slices],
            "o_orderkey",
        )
    )
    return cascade.unionByName(right)


@query(
    "q17_sql_text_entry",
    oracle=f"""
    SELECT n.n_name, o.o_orderstatus,
           {oracle_dsum('o.o_totalprice', 'revenue')}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, o.o_orderstatus
    """,
)
def q17_sql_text_entry(spark, sf_dir):
    """S5: the SQL-string entry point — `dbSendQuery(dcon, "SELECT …")`
    (`Openness_Data_Frame_Prep.R:8-18`) → `spark.sql` over registered
    views. Same Catalyst plan as the DataFrame API; lazy, never a
    blocking full fetch."""
    register_views(spark, sf_dir, ["orders", "customer", "nation"])
    return spark.sql(
        """
        SELECT n.n_name, o.o_orderstatus,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                 AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, o.o_orderstatus
        """
    )


@query(
    "q18_fact_fact_join",
    oracle="""
    WITH pairs AS (
        SELECT a.user_id,
               epoch_us(a.ts) // 86400000000 AS day,
               COUNT(*) AS n_pairs,
               MIN(epoch_us(b.ts) - epoch_us(a.ts)) AS min_gap_us
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND epoch_us(a.ts) // 86400000000 = epoch_us(b.ts) // 86400000000
         AND a.event_type = 'view' AND b.event_type = 'purchase'
         AND epoch_us(b.ts) > epoch_us(a.ts)
        GROUP BY a.user_id, epoch_us(a.ts) // 86400000000
    ),
    tgt AS (
        SELECT c_custkey AS k, c_name AS name, c_acctbal AS bal
        FROM customer WHERE c_custkey % 3 <> 0
    ),
    latest AS (
        SELECT o_custkey AS k, arg_max(o_totalprice, o_orderkey) AS price
        FROM orders WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_custkey
    ),
    merged AS (
        SELECT COALESCE(t.k, s.k) AS user_id,
               CASE WHEN t.k IS NULL THEN 'NEW' ELSE t.name END AS name,
               CASE WHEN t.k IS NULL THEN s.price
                    WHEN s.k IS NULL THEN t.bal
                    ELSE t.bal + s.price END AS bal
        FROM tgt t FULL OUTER JOIN latest s ON t.k = s.k
        WHERE NOT (t.k IS NOT NULL AND s.k IS NOT NULL
                   AND s.price < 30000)
    ),
    snap_old AS (
        SELECT c_custkey AS k, c_name AS name, c_acctbal AS bal
        FROM customer WHERE c_custkey % 5 <> 0
    ),
    snap_new AS (
        SELECT c_custkey AS k, c_name AS name,
               c_acctbal + (c_custkey % 11) AS bal
        FROM customer WHERE c_custkey % 7 <> 0
    ),
    diffed AS (
        SELECT CASE WHEN o.k IS NULL THEN 'insert'
                    WHEN n.k IS NULL THEN 'delete'
                    WHEN NOT (o.name IS NOT DISTINCT FROM n.name
                              AND o.bal IS NOT DISTINCT FROM n.bal)
                    THEN 'update' END AS op,
               COALESCE(n.k, o.k) AS k, n.name AS name, n.bal AS bal
        FROM snap_old o FULL OUTER JOIN snap_new n ON o.k = n.k
    ),
    purch AS (
        SELECT user_id, epoch_us(ts) AS seq,
               arg_max(CASE WHEN value < 33 THEN 'low'
                            WHEN value < 66 THEN 'mid'
                            ELSE 'high' END, event_id) AS tier
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, epoch_us(ts)
    ),
    compressed AS (
        SELECT user_id, seq, tier
        FROM (SELECT user_id, seq, tier,
                     LAG(tier) OVER (PARTITION BY user_id
                                     ORDER BY seq) AS prev
              FROM purch)
        WHERE prev IS NULL OR prev <> tier
    ),
    hist AS (
        SELECT user_id, tier, seq AS eff_from,
               LEAD(seq) OVER (PARTITION BY user_id
                               ORDER BY seq) AS eff_to
        FROM compressed
    )
    SELECT 'pairs' AS kind, user_id, day, n_pairs, min_gap_us,
           CAST(NULL AS VARCHAR) AS name, CAST(NULL AS DOUBLE) AS bal,
           CAST(NULL AS BIGINT) AS eff_from,
           CAST(NULL AS BIGINT) AS eff_to,
           CAST(NULL AS BOOLEAN) AS is_current
    FROM pairs
    UNION ALL
    -- 'salted' (round 11): the SAME join routed through explicit key
    -- salting — membership must be bit-identical to the plain join
    SELECT 'salted', user_id, day, n_pairs, min_gap_us,
           NULL, NULL, NULL, NULL, NULL
    FROM pairs
    UNION ALL
    SELECT 'merge', user_id, NULL, NULL, NULL, name, bal,
           NULL, NULL, NULL
    FROM merged
    UNION ALL
    SELECT 'scd2', user_id, NULL, NULL, NULL, tier, NULL,
           eff_from, eff_to, eff_to IS NULL
    FROM hist
    UNION ALL
    SELECT concat('diff_', op), k, NULL, NULL, NULL, name, bal,
           NULL, NULL, NULL
    FROM diffed WHERE op IS NOT NULL
    """,
)
def q18_fact_fact_join(spark, sf_dir):
    """J10 + table maintenance. 'pairs': the one genuinely large
    fact-to-fact join — defender ⋈ offense tracking on
    (gameId, playId, frameId) (`DefPosModel.ipynb` cell 1, 12.9M-row
    output); here view→purchase pairings per (user, day). Both sides
    are big at scale → shuffle join on the composite key, skew-handled
    by AQE.

    'merge' (round 9): `merge.merge_into` — the reference rebuilds its
    derived tables wholesale (`dbWriteTable(..., overwrite=TRUE)`); at
    100 TB the incremental path is a keyed MERGE. The CDC batch (latest
    urgent order per customer via `latest_changes` — skew-safe
    aggregate winners) is applied to a customer snapshot: cheap orders
    delete the account, others add to its balance, unseen customers
    insert. The DuckDB oracle re-derives all four fates from a full
    outer join, so the clause projection itself is value-hashed.

    'scd2' (round 9): `merge.scd2_build` — type-2 dimension history of
    each user's purchase-value tier: no-op restatements compressed,
    effective ranges chained by one LEAD, open rows flagged current;
    oracle mirrors with LAG/LEAD."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.expr("ts_us div 86400000000")
    )
    a = e.filter(F.col("event_type") == "view").select(
        "user_id", "day", F.col("ts_us").alias("a_ts")
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "day", F.col("ts_us").alias("b_ts")
    )
    j = a.join(b, ["user_id", "day"]).filter(F.col("b_ts") > F.col("a_ts"))
    nb = F.lit(None).cast("bigint")
    pairs = (
        j.groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min(F.col("b_ts") - F.col("a_ts")).alias("min_gap_us"),
        )
        .select(
            F.lit("pairs").alias("kind"),
            "user_id",
            "day",
            "n_pairs",
            "min_gap_us",
            F.lit(None).cast("string").alias("name"),
            F.lit(None).cast("double").alias("bal"),
            nb.alias("eff_from"),
            nb.alias("eff_to"),
            F.lit(None).cast("boolean").alias("is_current"),
        )
    )

    # 'salted' (round 11): the SAME fact⋈fact join routed through
    # `relational.salted_join` — explicit key salting for the hot-key
    # case AQE's skew split can't reach. Membership must equal the
    # plain join bit-for-bit (salting moves rows between tasks, never
    # in or out of the result), so the oracle row is the same pairs
    # CTE tagged 'salted'.
    from ..operators.relational import salted_join

    j_s = salted_join(a, b, ["user_id", "day"], n_salts=4).filter(
        F.col("b_ts") > F.col("a_ts")
    )
    salted = (
        j_s.groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min(F.col("b_ts") - F.col("a_ts")).alias("min_gap_us"),
        )
        .select(
            F.lit("salted").alias("kind"),
            "user_id",
            "day",
            "n_pairs",
            "min_gap_us",
            F.lit(None).cast("string").alias("name"),
            F.lit(None).cast("double").alias("bal"),
            nb.alias("eff_from"),
            nb.alias("eff_to"),
            F.lit(None).cast("boolean").alias("is_current"),
        )
    )

    c = load_table(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"), "o_orderkey", "o_totalprice")
    )
    src = latest_changes(urgent, ["k"], "o_orderkey")
    merged = merge_into(
        target,
        src,
        ["k"],
        update_set={"bal": "t.bal + s.o_totalprice"},
        delete_condition="s.o_totalprice < 30000",
        insert_values={
            "k": "s.k",
            "name": "'NEW'",
            "bal": "s.o_totalprice",
        },
    ).select(
        F.lit("merge").alias("kind"),
        F.col("k").alias("user_id"),
        nb.alias("day"),
        nb.alias("n_pairs"),
        nb.alias("min_gap_us"),
        "name",
        "bal",
        nb.alias("eff_from"),
        nb.alias("eff_to"),
        F.lit(None).cast("boolean").alias("is_current"),
    )

    # 'diff_*' (round 9): `merge.snapshot_diff` — CDC feed generation
    # from two keyed snapshots (the inverse of the merge above); every
    # op fate occurs by construction of the %5/%7/%11 membership.
    snap_old = c.filter(F.col("c_custkey") % 5 != 0).select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    snap_new = c.filter(F.col("c_custkey") % 7 != 0).select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        (F.col("c_acctbal") + F.col("c_custkey") % 11).alias("bal"),
    )
    diffed = snapshot_diff(snap_old, snap_new, ["k"]).select(
        F.concat(F.lit("diff_"), F.col("op")).alias("kind"),
        F.col("k").alias("user_id"),
        nb.alias("day"),
        nb.alias("n_pairs"),
        nb.alias("min_gap_us"),
        "name",
        "bal",
        nb.alias("eff_from"),
        nb.alias("eff_to"),
        F.lit(None).cast("boolean").alias("is_current"),
    )

    purch = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts_us", "event_id", "value")
    )
    one = latest_changes(purch, ["user_id", "ts_us"], "event_id")
    tiers = one.select(
        "user_id",
        "ts_us",
        F.when(F.col("value") < 33, "low")
        .when(F.col("value") < 66, "mid")
        .otherwise("high")
        .alias("tier"),
    )
    scd2 = scd2_build(tiers, ["user_id"], "ts_us", ["tier"]).select(
        F.lit("scd2").alias("kind"),
        "user_id",
        nb.alias("day"),
        nb.alias("n_pairs"),
        nb.alias("min_gap_us"),
        F.col("tier").alias("name"),
        F.lit(None).cast("double").alias("bal"),
        "eff_from",
        "eff_to",
        "is_current",
    )
    return (
        pairs.unionByName(salted)
        .unionByName(merged)
        .unionByName(scd2)
        .unionByName(diffed)
    )


@query(
    "q39_rollup_cube_totals",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS l_returnflag,
           COALESCE(l_linestatus, '<all>') AS l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q39_rollup_cube_totals(spark, sf_dir):
    """OLAP grouping sets: df.rollup — subtotals per returnflag and a
    grand total in one aggregate pass (Spark expands grouping sets in
    a single shuffle; no N-pass union). Null grouping cells are
    recoded '<all>' so the hash compare is unambiguous."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            dsum("l_quantity", "sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias(
                "l_returnflag"
            ),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias(
                "l_linestatus"
            ),
            "n",
            "sum_qty",
        )
    )

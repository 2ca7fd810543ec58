"""Parity queries: scans, filters, joins, sorts, set ops
(SURVEY.md §2.1-2.3, §2.6-2.7).

Query naming: q<nn>_<slug>. Each docstring cites the reference
operator(s) it exercises.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.relational import (
    anti_join,
    asym_join,
    keep_first,
    mirror_self_join,
    semi_join,
    top_k,
    union_all,
)
from ..sources.io import load_table
from .registry import query
from .stable import davg, dsum, epoch_us, oracle_davg, oracle_dsum


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {oracle_dsum('l_quantity', 'sum_qty')},
           {oracle_dsum('l_extendedprice', 'sum_base_price')},
           {oracle_dsum('l_extendedprice*(1-l_discount)', 'sum_disc_price')},
           {oracle_dsum('l_extendedprice*(1-l_discount)*(1+l_tax)', 'sum_charge')},
           {oracle_davg('l_quantity', 'avg_qty')},
           {oracle_davg('l_extendedprice', 'avg_price')},
           {oracle_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    """Flagship: scan → filter (P4) → groupBy agg (A1/A4/A12-family),
    mirroring the shape of the openness-vs-coverage aggregate
    (`Openness_Data_Frame_Prep.R:8-15` + `radius_model.R:265-268`).
    Scale: single hash aggregate with map-side partials; the shipdate
    predicate and 7-column projection push into the parquet scan."""
    l = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc, "sum_disc_price"),
            dsum(disc * (1 + F.col("l_tax")), "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q02_segment_revenue",
    oracle=f"""
    SELECT c.c_mktsegment, o.o_orderstatus,
           {oracle_dsum('o.o_totalprice', 'revenue')},
           COUNT(*) AS n_orders
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment, o.o_orderstatus
    """,
)
def q02_segment_revenue(spark, sf_dir):
    """J1: fact ⋈ broadcast dim left join, the tracking⋈plays pattern
    (`Openness_Data_Frame_Prep.R:8-15`), joined J3-style on
    differently-named keys (o_custkey = c_custkey — the route-runner ⋈
    assigned-defender pattern of `Openness_Data_Frame_Prep.R:63`) with
    the right key dropped post-join (P2 `data[,-c(19,20)]`). customer
    is dim-sized → broadcast hash join, no shuffle of orders."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cdim = c.select("c_custkey", "c_mktsegment")
    joined = asym_join(
        o, F.broadcast(cdim), [("o_custkey", "c_custkey")], how="left"
    )
    return joined.groupBy("c_mktsegment", "o_orderstatus").agg(
        dsum("o_totalprice", "revenue"), F.count("*").alias("n_orders")
    )


@query(
    "q03_nation_revenue",
    oracle=f"""
    SELECT n.n_name, r.r_name,
           {oracle_dsum('l.l_extendedprice*(1-l.l_discount)', 'revenue')}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name, r.r_name
    """,
)
def q03_nation_revenue(spark, sf_dir):
    """J2 chain (the reference's ~15 merge sites, `DataCleaning.R:22`
    etc.) as a snowflake join. All four dims broadcast; Catalyst pushes
    the date filter below the joins so lineitem only joins qualifying
    orders."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (
        l.join(F.broadcast(o.select("o_orderkey", "o_custkey")),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy("n_name", "r_name").agg(dsum(rev, "revenue"))


@query(
    "q04_semi_anti_customers",
    oracle="""
    SELECT 'semi' AS kind, c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT 'anti' AS kind, c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q04_semi_anti_customers(spark, sf_dir):
    """J7 left-semi (`semi_join(tracking, cleaned_player_data)`,
    `Visualization.R:22`) unioned with J11 as a true anti join (the
    reference fakes anti with left join + `is.na`, `Matchup
    Information.R:86`); a `kind` tag keeps the branches apart in the
    hash compare. Semi/anti joins never duplicate or widen the left
    side — at scale each is a broadcast of the (distinct) right keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    semi = semi_join(
        c.select("c_custkey", "c_name"),
        urgent.withColumnRenamed("o_custkey", "c_custkey"),
        ["c_custkey"],
    ).select(F.lit("semi").alias("kind"), "c_custkey", "c_name")
    anti = anti_join(
        c.select("c_custkey", "c_name"),
        o.withColumnRenamed("o_custkey", "c_custkey"),
        ["c_custkey"],
    ).select(F.lit("anti").alias("kind"), "c_custkey", "c_name")
    return semi.unionByName(anti)


@query(
    "q06_mirror_self_joins",
    oracle="""
    SELECT 'pairs' AS kind, a.n_name AS a, b.n_name AS b,
           CAST(a.n_regionkey AS BIGINT) AS n, CAST(NULL AS BIGINT) AS n_m
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
    UNION ALL
    SELECT 'mirror' AS kind, m.o_orderpriority AS a, m.o_orderstatus AS b,
           m.n_orders AS n, COALESCE(mb.n_orders, 0) AS n_m
    FROM (SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
          FROM orders GROUP BY o_orderpriority, o_orderstatus) m
    LEFT JOIN (SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
          FROM orders GROUP BY o_orderpriority, o_orderstatus) mb
      ON m.o_orderpriority = mb.o_orderpriority
     AND mb.o_orderstatus = (CASE WHEN m.o_orderstatus = 'F' THEN 'O'
                                  WHEN m.o_orderstatus = 'O' THEN 'F'
                                  ELSE m.o_orderstatus END)
    """,
)
def q06_mirror_self_joins(spark, sf_dir):
    """J8 mirror self joins, both shapes the reference uses (round 3
    merge of two round-1 queries, COVERAGE.md): the 'pairs' branch is
    the raw self join — matchups ⋈ itself on reversed route within the
    same coverage (`Matchup Information.R:79-84`), here nation pairs
    within a region; the 'mirror' branch is J8+J11 composed —
    aggregate, self-join each group to its mirrored twin, null-fill
    misses with 0 (`Matchup Information.R:79-86`)."""
    n = load_table(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_name") < F.col("b.n_name")),
        )
        .select(
            F.lit("pairs").alias("kind"),
            F.col("a.n_name").alias("a"),
            F.col("b.n_name").alias("b"),
            F.col("a.n_regionkey").cast("bigint").alias("n"),
            F.lit(None).cast("bigint").alias("n_m"),
        )
    )
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders")
    )
    mirror = mirror_self_join(
        m.withColumn(
            "mirror_of",
            F.when(F.col("o_orderstatus") == "F", "O")
            .when(F.col("o_orderstatus") == "O", "F")
            .otherwise(F.col("o_orderstatus")),
        ),
        left_col="mirror_of",
        right_col="o_orderstatus",
        extra_keys=["o_orderpriority"],
        payload=["n_orders"],
    ).select(
        F.lit("mirror").alias("kind"),
        F.col("o_orderpriority").alias("a"),
        F.col("o_orderstatus").alias("b"),
        F.col("n_orders").alias("n"),
        F.coalesce(F.col("n_orders_m"), F.lit(0)).cast("bigint").alias("n_m"),
    )
    return pairs.unionByName(mirror)


@query(
    "q08_latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           epoch_us(o_orderdate) AS order_ts
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def q08_latest_order_per_customer(spark, sf_dir):
    """P9 with determinism: `distinct(gameId, playId, .keep_all=TRUE)`
    (`QBReadStats.R:139`) — keep-first under an explicit total order
    instead of physical row order. Timestamps exit as epoch micros
    (timezone-neutral)."""
    o = load_table(spark, sf_dir, "orders")
    return keep_first(
        o, ["o_custkey"], [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()]
    ).select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        epoch_us("o_orderdate").alias("order_ts"),
    )


@query(
    "q09_top10_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def q09_top10_orders(spark, sf_dir):
    """O2 global top-k (`QBReadStats.R:230-247`). Spark compiles
    orderBy+limit to TakeOrderedAndProject — per-partition heaps, no
    global sort, scales to any row count."""
    o = load_table(spark, sf_dir, "orders")
    return top_k(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        10,
    )


@query(
    "q11_priority_set_ops",
    oracle="""
    SELECT 'intersect' AS kind, o_custkey,
           CAST(NULL AS VARCHAR) AS a, CAST(NULL AS VARCHAR) AS b,
           CAST(NULL AS BIGINT) AS n
    FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    )
    UNION ALL
    SELECT 'except' AS kind, o_custkey, NULL, NULL, NULL FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    )
    UNION ALL
    SELECT 'distinct' AS kind, o_custkey, NULL, NULL, NULL FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
    )
    UNION ALL
    SELECT 'unionall' AS kind, CAST(NULL AS BIGINT) AS o_custkey,
           o_orderpriority AS a, o_orderstatus AS b, COUNT(*) AS n
    FROM (
        SELECT * FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        UNION ALL
        SELECT * FROM orders WHERE o_orderstatus = 'F'
    ) GROUP BY o_orderpriority, o_orderstatus
    """,
)
def q11_priority_set_ops(spark, sf_dir):
    """§2.7 set-flavored ops, tagged and unioned: intersect +
    except-distinct (engine surface beyond the reference) + P8
    `distinct()` / `unique()` / `drop_duplicates()`
    (`Openness_Data_Frame_Prep.R:83,95,98`) — the distinct branch
    absorbed round 1's q07. Round 6 absorbed q10 as the 'unionall'
    branch: U1 union-all (`DataCleaning.R:20`) + P5 set-membership
    filter (`BuildingReadOrder.R:56-57`); overlapping slices keep
    duplicate rows — union-all, not union-distinct."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    null_tail = [
        F.lit(None).cast("string").alias("a"),
        F.lit(None).cast("string").alias("b"),
        F.lit(None).cast("bigint").alias("n"),
    ]
    inter = a.intersect(b).select(
        F.lit("intersect").alias("kind"), "o_custkey", *null_tail
    )
    exc = a.subtract(b).select(
        F.lit("except").alias("kind"), "o_custkey", *null_tail
    )
    dis = (
        o.filter(F.col("o_orderstatus") == "P")
        .select("o_custkey")
        .distinct()
        .select(F.lit("distinct").alias("kind"), "o_custkey", *null_tail)
    )
    ua = o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    ub = o.filter(F.col("o_orderstatus") == "F")
    uni = (
        union_all(ua, ub)
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("unionall").alias("kind"),
            F.lit(None).cast("bigint").alias("o_custkey"),
            F.col("o_orderpriority").alias("a"),
            F.col("o_orderstatus").alias("b"),
            "n",
        )
    )
    return inter.unionByName(exc).unionByName(dis).unionByName(uni)



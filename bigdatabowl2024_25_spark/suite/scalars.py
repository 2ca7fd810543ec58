"""Parity queries: scalar functions (SURVEY.md §2.8, F1-F15).

Consolidation note (round 3): the driver records at most 50 parity
queries, so the per-function queries are folded into per-scan queries
(COVERAGE.md maps functions to query+column): q51 carries F3/F7/F8/F9
over one events scan, q53 carries F10/F11/F12 over one lineitem scan,
q57 carries F1/F2/F13 over one events scan. Merging is also the right
scale shape — all these are narrow per-row transforms, so one scan
computing six columns strictly beats six scans computing one.

F7 (timestamp pad+parse) has no string-timestamp column in the
synthetic tables, so q51 manufactures the strings in-query (modular
epoch arithmetic, both engines) and the oracle checks the parse
round-trip against closed-form arithmetic — the same pattern
suite/dedup.py uses to manufacture its corpus.

Transcendental functions (sin/cos/atan2, log) differ by ulps between
the JVM and libm — their outputs are rounded to 6 decimals on both
sides. sqrt is IEEE-correctly-rounded and needs no rounding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.scalar import (
    argmin_across,
    clean_label,
    clock_to_seconds,
    coalesce_nearest,
    dynamic_lookup,
    euclid,
    join_label,
    pad_time_fraction,
    physics_step,
    recode,
    reverse_words,
    seconds_to_clock,
)
from ..sources.io import load_table
from .registry import query


@query(
    "q50_string_functions",
    oracle="""
    WITH snm_keyed AS (
        SELECT 1 AS pass, c_custkey AS id, c_name AS t, c_name AS key
        FROM customer WHERE c_custkey < 200 AND c_name IS NOT NULL
        UNION ALL
        SELECT 2, c_custkey, c_name, reverse(c_name)
        FROM customer WHERE c_custkey < 200 AND c_name IS NOT NULL
    ),
    snm_leads AS (
        SELECT id, t, lead(id, 1) OVER w AS nid, lead(t, 1) OVER w AS nt
        FROM snm_keyed
        WINDOW w AS (PARTITION BY pass, substr(key, 1, 4)
                     ORDER BY key ASC, id ASC)
        UNION ALL
        SELECT id, t, lead(id, 2) OVER w2, lead(t, 2) OVER w2
        FROM snm_keyed
        WINDOW w2 AS (PARTITION BY pass, substr(key, 1, 4)
                      ORDER BY key ASC, id ASC)
    ),
    snm_pairs AS (
        SELECT DISTINCT LEAST(id, nid) AS id_a, GREATEST(id, nid) AS id_b,
               CASE WHEN id < nid THEN t ELSE nt END AS ta,
               CASE WHEN id < nid THEN nt ELSE t END AS tb
        FROM snm_leads WHERE nid IS NOT NULL
    )
    SELECT 'scalar' AS kind, p_partkey AS id_a,
           regexp_replace(p_type, '[ -]', '.', 'g') AS clean_type,
           concat_ws(' - ', p_brand, p_type) AS brand_type,
           array_to_string(list_reverse(string_split(p_name, ' ')), ' ')
             AS reversed_name,
           CAST(NULL AS BIGINT) AS id_b, CAST(NULL AS BIGINT) AS dist
    FROM part
    UNION ALL
    SELECT 'fuzzy', a.c_custkey, NULL, NULL, NULL, b.c_custkey,
           levenshtein(a.c_name, b.c_name)
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE a.c_custkey < 200 AND b.c_custkey < 200
      AND levenshtein(a.c_name, b.c_name) <= 2
    UNION ALL
    SELECT 'snm', id_a, NULL, NULL, NULL, id_b,
           levenshtein(ta, tb)
    FROM snm_pairs WHERE levenshtein(ta, tb) <= 2
    """,
)
def q50_string_functions(spark, sf_dir):
    """F4 regex replace-all (`cover_threshold.R:18-20`), F5 concat with
    sep (`Matchup Information.R:102`), F6 split/reverse/rejoin
    (`Matchup Information.R:75-77`). DuckDB needs the 'g' flag for
    replace-all; Spark replaces all by default.

    'fuzzy' (round 9): `fuzzy.edit_distance_self_join` — q-gram count
    blocking + exact levenshtein verify over near-identical customer
    names (sequential key strings: the blocking's adversarial case).
    The oracle is a BRUTE-FORCE cross-join levenshtein, so the
    funnel's recall must be exactly 100% — a false negative in the
    gram bound fails the hash compare."""
    p = load_table(spark, sf_dir, "part")
    nb = F.lit(None).cast("bigint")
    scalar = p.select(
        F.lit("scalar").alias("kind"),
        F.col("p_partkey").alias("id_a"),
        clean_label(F.col("p_type")).alias("clean_type"),
        join_label(" - ", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        reverse_words(F.col("p_name")).alias("reversed_name"),
        nb.alias("id_b"),
        nb.alias("dist"),
    )
    from ..operators.fuzzy import edit_distance_self_join

    names = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 200)
        .select("c_custkey", "c_name")
    )
    ns = F.lit(None).cast("string")
    fz = edit_distance_self_join(names, "c_custkey", "c_name", k=2).select(
        F.lit("fuzzy").alias("kind"),
        "id_a",
        ns.alias("clean_type"),
        ns.alias("brand_type"),
        ns.alias("reversed_name"),
        "id_b",
        F.col("dist").cast("bigint").alias("dist"),
    )

    # 'snm' (round 10): sorted-neighborhood blocking over the SAME
    # names (`fuzzy.sorted_neighborhood_self_join`) — the merge/purge
    # paradigm beside the gram-count funnel; two passes (name,
    # reversed name), window 3, exact levenshtein verify. The oracle
    # replays both pass windows with identical partition/order keys.
    from ..operators.fuzzy import sorted_neighborhood_self_join

    snm = sorted_neighborhood_self_join(
        names, "c_custkey", "c_name", k=2, window=3, prefix_len=4
    ).select(
        F.lit("snm").alias("kind"),
        "id_a",
        ns.alias("clean_type"),
        ns.alias("brand_type"),
        ns.alias("reversed_name"),
        "id_b",
        F.col("dist").cast("bigint").alias("dist"),
    )
    return scalar.unionByName(fz).unionByName(snm)


@query(
    "q51_time_scalars",
    oracle="""
    SELECT event_id,
           printf('%d:%02d',
                  CAST(((epoch_us(ts) // 1000000) % 3600) // 60 AS INT),
                  CAST((epoch_us(ts) // 1000000) % 60 AS INT)) AS clock,
           CAST(((epoch_us(ts) // 1000000) % 3600) // 60 AS INT) * 60
             + CAST((epoch_us(ts) // 1000000) % 60 AS INT) AS clock_seconds,
           epoch_us(ts) - 2000000 AS ts_minus_2s_us,
           CASE WHEN value < 50 THEN 1 WHEN value < 100 THEN 2
                WHEN value < 150 THEN 3 WHEN value < 200 THEN 4
                WHEN value < 250 THEN 5 ELSE 6 END AS bucket_case,
           LEAST(CAST(FLOOR(value / 50) AS BIGINT) + 1, 6) AS bucket_formula,
           CASE WHEN event_type = 'error' THEN NULL
                ELSE ((epoch_us(ts) // 1000000) % 86400) * 1000000
                     + epoch_us(ts) % 1000000 END AS parsed_us,
           CAST(json_extract(props, '$.k') AS BIGINT) AS props_k,
           CAST(json_extract(
               concat('{"a": {"b": [',
                      CAST(CAST(json_extract(props, '$.k') AS BIGINT)
                           AS VARCHAR),
                      ',',
                      CAST(CAST(json_extract(props, '$.k') AS BIGINT) * 2
                           AS VARCHAR),
                      ']}}'),
               '$.a.b[1]') AS BIGINT) AS deep_v,
           CAST(len(json_keys(props)) AS BIGINT) AS n_json_keys
    FROM events
    """,
)
def q51_time_scalars(spark, sf_dir):
    """F9 clock string ↔ seconds (`Visualization.R:111-125`), F8
    interval arithmetic (`DefPosModel.ipynb` cell 1) in pure epoch
    micros (timezone-free), F3 the 6-way nested ifelse time bucket
    (`BuildingReadOrder.R:32-36`) and its closed-form equivalent, and
    F7 pad_time_fraction + to_datetime(errors='coerce')
    (`DefPosModel.ipynb` cell 1): string timestamps are manufactured
    in-query ('1970-01-01 HH:mm:ss' + variable-width fraction;
    event_type='error' rows get an unparseable string), then padded and
    parsed — the oracle's parsed_us is the CLOSED-FORM in-day micros,
    so the whole build→pad→parse→micros chain is checked against
    independent arithmetic, including the coerce-to-null path."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    total_sec = F.expr("ts_us div 1000000")
    mins = ((total_sec % 3600) / 60).cast("int")
    secs = (total_sec % 60).cast("int")
    clock = seconds_to_clock(mins * 60 + secs)
    bucket_case = (
        F.when(v < 50, 1)
        .when(v < 100, 2)
        .when(v < 150, 3)
        .when(v < 200, 4)
        .when(v < 250, 5)
        .otherwise(6)
    )
    # F7 input manufacture: naive timestamp string with a trailing-zero-
    # trimmed fraction (exercises the rpad), unparseable for 'error' rows
    base = F.format_string(
        "1970-01-01 %02d:%02d:%02d",
        F.expr("(ts_us div 1000000) % 86400 div 3600").cast("int"),
        F.expr("(ts_us div 1000000) % 3600 div 60").cast("int"),
        F.expr("(ts_us div 1000000) % 60").cast("int"),
    )
    fracs = F.regexp_replace(
        F.lpad(F.expr("ts_us % 1000000").cast("string"), 6, "0"), "0+$", ""
    )
    ts_str = (
        F.when(F.col("event_type") == "error", F.lit("not a time"))
        .when(fracs == "", base)
        .otherwise(F.concat(base, F.lit("."), fracs))
    )
    # timezone-free micros: the driver's session tz is unknown, so never
    # cast NTZ→TZ; hour/minute/extract(second) read the NTZ fields directly
    withp = e.withColumn("__parsed", pad_time_fraction(ts_str))
    parsed_us = (
        (F.hour("__parsed") * 3600 + F.minute("__parsed") * 60).cast("bigint")
        * 1_000_000
        + F.expr("CAST(extract(SECOND FROM __parsed) * 1000000 AS BIGINT)")
    )
    # round 9: the semi-structured leg — events.props is a JSON
    # document; typed parse (from_json), JSONPath probe over a
    # manufactured nested document, and the key-count drift detector
    from ..functions.scalar import json_field, json_n_keys, json_path

    props_k = json_field(F.col("props"), "k INT", "k").cast("bigint")
    nested = F.concat(
        F.lit('{"a": {"b": ['),
        props_k.cast("string"),
        F.lit(","),
        (props_k * 2).cast("string"),
        F.lit("]}}"),
    )
    return withp.select(
        "event_id",
        clock.alias("clock"),
        clock_to_seconds(clock).alias("clock_seconds"),
        (F.col("ts_us") - 2_000_000).alias("ts_minus_2s_us"),
        bucket_case.alias("bucket_case"),
        F.least(F.floor(v / 50).cast("bigint") + 1, F.lit(6).cast("bigint")).alias(
            "bucket_formula"
        ),
        parsed_us.alias("parsed_us"),
        props_k.alias("props_k"),
        json_path(nested, "$.a.b[1]").cast("bigint").alias("deep_v"),
        json_n_keys(F.col("props")).cast("bigint").alias("n_json_keys"),
    )


@query(
    "q53_null_cascade",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0.0), l_tax, 0.5) AS disc_or_tax,
           COALESCE(NULLIF(l_discount, 0.0), 0.0) AS disc_filled,
           list_position(
             [abs(l_quantity*10 - 50.0), abs(l_extendedprice/1000 - 50.0),
              abs(l_discount*100 - 50.0), abs(l_tax*100 - 50.0)],
             list_min(
             [abs(l_quantity*10 - 50.0), abs(l_extendedprice/1000 - 50.0),
              abs(l_discount*100 - 50.0), abs(l_tax*100 - 50.0)])
           ) AS nearest_idx
    FROM lineitem WHERE l_discount IS NOT NULL
    """,
)
def q53_null_cascade(spark, sf_dir):
    """F10 constant null-fill (`DefCoverage.ipynb` cells 4-5), F11
    nearest-column coalesce cascade (`QBReadStats.R:70-93`), P6 null
    filter, and F12 argmin-across-columns — which read window the throw
    falls into, `max.col(-diffs)` (`QBReadStats.R:102-114`) — all per-row
    over ONE lineitem scan."""
    l = load_table(spark, sf_dir, "lineitem")
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    cols = [
        F.col("l_quantity") * 10,
        F.col("l_extendedprice") / 1000,
        F.col("l_discount") * 100,
        F.col("l_tax") * 100,
    ]
    return l.filter(F.col("l_discount").isNotNull()).select(
        "l_orderkey",
        "l_linenumber",
        coalesce_nearest([d, F.col("l_tax"), F.lit(0.5)], 0).alias("disc_or_tax"),
        F.coalesce(d, F.lit(0.0)).alias("disc_filled"),
        argmin_across(cols, F.lit(50.0)).cast("int").alias("nearest_idx"),
    )


@query(
    "q56_region_recode",
    oracle="""
    SELECT n_nationkey,
           CASE r_name WHEN 'AFRICA' THEN 'AF' WHEN 'AMERICA' THEN 'AM'
                       WHEN 'ASIA' THEN 'AS' WHEN 'EUROPE' THEN 'EU'
                       ELSE 'OT' END AS region_abbr
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q56_region_recode(spark, sf_dir):
    """F15: dictionary recode — the 32-entry team-abbr → name map
    (`Visualization.R:93-105`) as a literal create_map with default."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    return j.select(
        "n_nationkey",
        recode(
            F.col("r_name"),
            {"AFRICA": "AF", "AMERICA": "AM", "ASIA": "AS", "EUROPE": "EU"},
            default=F.lit("OT"),
        ).alias("region_abbr"),
    )


@query(
    "q57_physics",
    oracle="""
    SELECT event_id,
           ROUND(value*0.1 + 0.5*(value/10)*(0.1*0.1), 6) AS distance_step,
           sqrt((value - 60.0)*(value - 60.0)
                + (value/2 - 26.65)*(value/2 - 26.65)) AS dist_to_center,
           ROUND(atan2(value/2 - 26.65, value - 60.0), 6) AS approach_angle,
           ROUND(cos(value / 100.0), 6) AS cos_v,
           ROUND(sin(value / 100.0), 6) AS sin_v,
           CASE event_type
                WHEN 'click' THEN value * 1.0
                WHEN 'view' THEN value * 2.0
                WHEN 'purchase' THEN value * 3.0
                WHEN 'signup' THEN value * 4.0
                WHEN 'error' THEN value * -1.0
           END AS routed_value
    FROM events
    """,
)
def q57_physics(spark, sf_dir):
    """F1 physics step (`BuildingReadOrder.R:87`) + F2 math
    (`radius_model.R:31,69,134,141`) + F13 dynamic column lookup by row
    value — `data[row, paste0("prob_", cov)]` (`cover_threshold.R:26-35`)
    as a literal-keyed map indexed per row — one events scan. sqrt is
    correctly rounded (exact parity); sin/cos/atan2 are rounded to 6 on
    both engines."""
    e = load_table(spark, sf_dir, "events")
    v = F.col("value")
    x, y = v, v / 2
    return e.select(
        "event_id",
        # round-6: DuckDB may FMA-contract the a*b + c*d*e chain
        F.round(physics_step(v, v / 10), 6).alias("distance_step"),
        euclid(x, y, F.lit(60.0), F.lit(26.65)).alias("dist_to_center"),
        F.round(F.atan2(y - 26.65, x - 60.0), 6).alias("approach_angle"),
        F.round(F.cos(v / 100.0), 6).alias("cos_v"),
        F.round(F.sin(v / 100.0), 6).alias("sin_v"),
        dynamic_lookup(
            {
                "click": v * 1.0,
                "view": v * 2.0,
                "purchase": v * 3.0,
                "signup": v * 4.0,
                "error": v * -1.0,
            },
            F.col("event_type"),
        ).alias("routed_value"),
    )

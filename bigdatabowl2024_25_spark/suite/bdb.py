"""Parity queries: the BDB numeric kernels and the full five-stage
pipeline DAG.

q90: the MC openness kernel (X1/X2) is irreducibly procedural — no SQL
equivalent — so the driver records a rows-only check; the real
correctness evidence is tests/test_kernels.py (reference smoke inputs,
interception-equation property, partition-invariance).

q91: the END-TO-END pipeline — openness-prep → closed-form radius →
read-order → PRESS — over a deterministic synthetic BDB world built
identically in both engines (the manufacture-inputs-in-query pattern
of suite/dedup.py). The closed-form radius stage
(pipelines/radius_stage.build_radius_data_closed_form) replaces the MC
kernel with the toward-ball Apollonius boundary, field-clamped
(`killer_plot_function.R:58-70`), so every stage is IEEE-deterministic
and the whole DAG is hash-checked: a regression in the pipeline WIRING
(not just its operators) now hits CORRECTNESS.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ..functions.kernels import score_openness
from ..pipelines import openness_prep, qb_stats, radius_stage, read_order
from ..sources.io import load_table
from .registry import query


#: The 24-row constant output of q90, pinned as a literal VALUES
#: oracle (repr()-exact doubles; regenerate by running the query and
#: re-pasting if the kernel intentionally changes). See q90's
#: docstring for why a literal oracle is sound here.
_Q90_ORACLE = """
    SELECT CAST(gameId AS BIGINT) AS gameId,
           CAST(playId AS BIGINT) AS playId,
           CAST(nflId AS BIGINT) AS nflId,
           CAST(frameId AS BIGINT) AS frameId,
           CAST(open_count AS DOUBLE) AS open_count
    FROM (VALUES
        (100, 0, 1000, 0, 7.2),
        (100, 2, 1012, 12, 79.0),
        (100, 6, 1006, 6, 21.0),
        (100, 8, 1018, 18, 214.4),
        (200, 1, 1001, 1, 273.59999999999997),
        (200, 3, 1013, 13, 52.2),
        (200, 7, 1007, 7, 24.8),
        (200, 9, 1019, 19, 145.2),
        (300, 0, 1020, 20, 76.6),
        (300, 2, 1002, 2, 188.8),
        (300, 4, 1014, 14, 36.0),
        (300, 8, 1008, 8, 8.4),
        (400, 1, 1021, 21, 51.8),
        (400, 3, 1003, 3, 169.2),
        (400, 5, 1015, 15, 29.0),
        (400, 9, 1009, 9, 279.0),
        (500, 0, 1010, 10, 184.6),
        (500, 2, 1022, 22, 32.4),
        (500, 4, 1004, 4, 85.0),
        (500, 6, 1016, 16, 7.0),
        (600, 1, 1011, 11, 148.2),
        (600, 3, 1023, 23, 9.8),
        (600, 5, 1005, 5, 47.6),
        (600, 7, 1017, 17, 260.0)
    ) AS t(gameId, playId, nflId, frameId, open_count)
"""


def _q90_base(spark):
    """The 24-row parity fixture, derived from spark.range — NOT from
    the sf tables, so the kernel inputs (and therefore the output) are
    byte-identical regardless of scale factor or testdata
    regeneration. All inputs are dyadic doubles (k*0.25 steps), so the
    column arithmetic below is exact in IEEE double."""
    v = (F.col("id") * 7 % 40 + (F.col("id") % 4) * 0.25).alias("v")
    base = spark.range(24).select("id", v)
    v = F.col("v")
    return base.select(
        (F.col("id") % 6 * 100 + 100).cast("long").alias("gameId"),
        (F.col("id") % 10).cast("long").alias("playId"),
        (F.col("id") + 1000).cast("long").alias("nflId"),
        (F.col("id") % 100).cast("long").alias("frameId"),
        (v % 8 + 2).alias("s"),
        ((v * 7) % 360).alias("dir"),
        (v % 100 + 5).alias("x"),
        (v % 45 + 3).alias("y"),
        F.lit(18.0).alias("ball_speed"),
        (v % 110).alias("fx"),
        (v % 50).alias("fy"),
        F.array(
            F.struct(
                ((v * 3) % 110).alias("x"),
                ((v * 3) % 50).alias("y"),
                F.lit(6.0).alias("s"),
            ),
            F.struct(
                ((v * 5) % 110).alias("x"),
                ((v * 5) % 50).alias("y"),
                F.lit(7.0).alias("s"),
            ),
            F.struct(
                ((v * 11) % 110).alias("x"),
                ((v * 11) % 50).alias("y"),
                F.lit(5.5).alias("s"),
            ),
        ).alias("defenders"),
    )


@query("q90_openness_kernel", oracle=_Q90_ORACLE)
def q90_openness_kernel(spark, sf_dir):
    """X1+X2 end-to-end: synthetic tracking rows scored by the
    mapInPandas openness kernel at reduced MC density.

    Oracle design (round 6, VERDICT item 2): the MC kernel is not
    SQL-expressible, but it IS a pure function of row identity — the
    RNG seed is derived from (gameId, playId, nflId, frameId)
    (`functions/kernels.py` row_seed), pinned by determinism and
    partition-invariance tests, and since round 6 the fixture comes
    from spark.range, not the regenerating sf tables. Its 24-row
    output is therefore a compile-time constant, emitted as a literal
    VALUES oracle with repr()-exact doubles (shortest-roundtrip
    literals parse to identical bits in DuckDB). The parity test and
    the driver's hash gate recompute the kernel and compare against
    the literal, so ANY kernel drift — numpy stream change, seed
    change, scoring change — flips q90 red instead of hiding behind a
    rows-only check."""
    return score_openness(_q90_base(spark), density=5.0)


# --- q91: the five-stage DAG, end to end -----------------------------------

#: world dimensions: 6 games x 4 plays x 30 frames x 15 roster slots.
#: lid (local id): 0 football, 1 QB, 2-6 route runners, 7-13 defenders,
#: 14 extra offensive player (blocks, runs no route).
_G, _P, _FR, _IDS = 6, 4, 30, 15

#: constants inlined into BOTH engines via repr() so the literals are
#: bit-identical (math.hypot != sqrt(x^2+y^2) in the last ulp).
_R_CAP = repr(math.hypot(120.0, 53.3))
_DT2 = repr(0.1 * 0.1)

_ROLLOUTS = (
    "'DESIGNED_ROLLOUT_RIGHT','DESIGNED_ROLLOUT_LEFT','QB_SNEAK','DESIGNED_RUN'"
)


def _world(spark):
    """The synthetic BDB star schema, derived from spark.range with the
    same modular-arithmetic formulas the oracle CTEs use. All doubles
    are dyadic (k + .25, k/4) so cross-engine sums are exact."""
    g, p, f, lid = F.col("g"), F.col("p"), F.col("f"), F.col("lid")
    nfl = (g * 100 + lid).cast("long")
    base = spark.range(_G * _P * _FR * _IDS).select(
        F.expr(f"id div {_P * _FR * _IDS}").alias("g"),
        F.expr(f"(id div {_FR * _IDS}) % {_P}").alias("p"),
        (F.expr(f"(id div {_IDS}) % {_FR}") + 1).alias("f"),
        (F.col("id") % _IDS).alias("lid"),
    )
    tracking = base.select(
        g.alias("gameId"),
        p.alias("playId"),
        nfl.alias("nflId"),
        f.alias("frameId"),
        F.when(f >= 3, "AFTER_SNAP").otherwise("BEFORE_SNAP").alias("frameType"),
        F.when(f == 10 + (g + p) % 5, "pass_forward").alias("event"),
        F.when(lid == 0, "BALL")
        .when(lid.isin(1, 2, 3, 4, 5, 6, 14), "OFF")
        .otherwise("DEF")
        .alias("club"),
        F.when(lid == 0, "football")
        .otherwise(F.concat(F.lit("P"), nfl.cast("string")))
        .alias("displayName"),
        (((lid * 7 + f * 2 + g + p * 5) % 110) + 0.25).alias("x"),
        (((lid * 11 + f * 3 + g * 2 + p) % 50) + 0.25).alias("y"),
        (((lid * 13 + f * 7 + g * 3 + p) % 32) / 4.0 + 0.25).alias("s"),
        (((lid * 5 + f) % 8) / 4.0).alias("a"),
        (((lid * 29 + f * 11) % 360) * 1.0).alias("dir"),
    )
    gp = spark.range(_G * _P).select(
        F.expr(f"id div {_P}").alias("gameId"), (F.col("id") % _P).alias("playId")
    )
    gg, pp = F.col("gameId"), F.col("playId")
    plays = gp.select(
        "gameId",
        "playId",
        F.lit("DEF").alias("defensiveTeam"),
        F.lit("OFF").alias("possessionTeam"),
        (~((F.col("gameId") == 1) & (F.col("playId") == 2))).alias("isDropback"),
        ((F.col("playId") + 1) * 0.5 + F.col("gameId") * 0.25 + 0.03).alias(
            "dropbackDistance"
        ),
        F.when(F.col("playId") == 3, "QB_SNEAK")
        .otherwise("TRADITIONAL")
        .alias("dropbackType"),
        # situational columns for the ML feature stage (q92):
        # modular-arithmetic ints + one NULL coverage label (g=5,p=3)
        # to exercise the label filter
        (pp % 4 + 1).alias("down"),
        ((gg * 3 + pp * 2) % 15 + 1).alias("yardsToGo"),
        ((gg * 7 + pp * 11) % 99 + 1).alias("absoluteYardlineNumber"),
        ((gg * 2 + pp) % 35).alias("preSnapHomeScore"),
        ((gg + pp * 3) % 28).alias("preSnapVisitorScore"),
        F.when((gg + pp) % 9 == 8, F.lit(None).cast("string"))
        .otherwise(
            F.element_at(
                F.array(
                    F.lit("Cover-1"), F.lit("Cover-2"),
                    F.lit("Cover-3"), F.lit("Quarters"),
                ),
                ((gg + pp) % 4 + 1).cast("int"),
            )
        )
        .alias("pff_passCoverage"),
    )
    gl = spark.range(_G * (_IDS - 1)).select(
        F.expr(f"id div {_IDS - 1}").alias("g"),
        (F.col("id") % (_IDS - 1) + 1).alias("lid"),
    )
    nfl2 = (F.col("g") * 100 + F.col("lid")).cast("long")
    players = gl.select(
        nfl2.alias("nflId"),
        F.when(F.col("lid") == 1, "QB")
        .when(F.col("lid").isin(2, 3, 4, 5, 6, 14), "WR")
        .otherwise("CB")
        .alias("position"),
        F.concat(F.lit("P"), nfl2.cast("string")).alias("displayName"),
    )
    gpl = spark.range(_G * _P * (_IDS - 1)).select(
        F.expr(f"id div {_P * (_IDS - 1)}").alias("g"),
        F.expr(f"(id div {_IDS - 1}) % {_P}").alias("p"),
        (F.col("id") % (_IDS - 1) + 1).alias("lid"),
    )
    g3, p3, l3 = F.col("g"), F.col("p"), F.col("lid")
    player_play = gpl.select(
        g3.alias("gameId"),
        p3.alias("playId"),
        (g3 * 100 + l3).cast("long").alias("nflId"),
        l3.between(2, 6).alias("wasRunningRoute"),
        F.when(l3 == 2, "GO")
        .when(l3 == 3, "SLANT")
        .when(l3 == 4, "OUT")
        .when(l3 == 5, "POST")
        .when(l3 == 6, "CROSS")
        .alias("routeRan"),
        F.when(l3.between(2, 6), (g3 * 100 + l3 + 5).cast("long")).alias(
            "pff_primaryDefensiveCoverageMatchupNflId"
        ),
        F.when(
            l3.between(7, 13),
            F.when((l3 + g3) % 2 == 0, "MAN").otherwise("ZONE"),
        ).alias("pff_defensiveCoverageAssignment"),
        (l3 == 2 + (g3 + p3) % 5).alias("wasTargettedReceiver"),
    )
    return tracking, plays, players, player_play


_WORLD_SQL = f"""
    trk AS (
        SELECT i // {_P * _FR * _IDS} AS g, (i // {_FR * _IDS}) % {_P} AS p,
               (i // {_IDS}) % {_FR} + 1 AS f, i % {_IDS} AS lid
        FROM range(0, {_G * _P * _FR * _IDS}) t(i)
    ),
    trackingw AS (
        SELECT g AS gameId, p AS playId, g*100 + lid AS nflId, f AS frameId,
               CASE WHEN f >= 3 THEN 'AFTER_SNAP' ELSE 'BEFORE_SNAP' END AS frameType,
               CASE WHEN f = 10 + (g+p) % 5 THEN 'pass_forward' END AS event,
               CASE WHEN lid = 0 THEN 'BALL'
                    WHEN lid IN (1,2,3,4,5,6,14) THEN 'OFF'
                    ELSE 'DEF' END AS club,
               CASE WHEN lid = 0 THEN 'football'
                    ELSE 'P' || CAST(g*100+lid AS VARCHAR) END AS displayName,
               ((lid*7 + f*2 + g + p*5) % 110) + 0.25 AS x,
               ((lid*11 + f*3 + g*2 + p) % 50) + 0.25 AS y,
               ((lid*13 + f*7 + g*3 + p) % 32)/4.0 + 0.25 AS s,
               ((lid*5 + f) % 8)/4.0 AS a
        FROM trk
    ),
    playsw AS (
        SELECT DISTINCT g AS gameId, p AS playId,
               NOT (g = 1 AND p = 2) AS isDropback,
               (p+1)*0.5 + g*0.25 + 0.03 AS dropbackDistance,
               CASE WHEN p = 3 THEN 'QB_SNEAK' ELSE 'TRADITIONAL' END AS dropbackType,
               p % 4 + 1 AS down,
               (g*3 + p*2) % 15 + 1 AS yardsToGo,
               (g*7 + p*11) % 99 + 1 AS absoluteYardlineNumber,
               (g*2 + p) % 35 AS preSnapHomeScore,
               (g + p*3) % 28 AS preSnapVisitorScore,
               CASE WHEN (g + p) % 9 = 8 THEN NULL
                    ELSE ['Cover-1','Cover-2','Cover-3','Quarters'][(g + p) % 4 + 1]
               END AS pff_passCoverage
        FROM trk
    ),
    playersw AS (
        SELECT DISTINCT g*100 + lid AS nflId,
               CASE WHEN lid = 1 THEN 'QB'
                    WHEN lid IN (2,3,4,5,6,14) THEN 'WR' ELSE 'CB' END AS position,
               'P' || CAST(g*100+lid AS VARCHAR) AS displayName
        FROM trk WHERE lid >= 1
    ),
    ppw AS (
        SELECT DISTINCT g AS gameId, p AS playId, g*100 + lid AS nflId,
               lid BETWEEN 2 AND 6 AS wasRunningRoute,
               CASE lid WHEN 2 THEN 'GO' WHEN 3 THEN 'SLANT' WHEN 4 THEN 'OUT'
                        WHEN 5 THEN 'POST' WHEN 6 THEN 'CROSS' END AS routeRan,
               CASE WHEN lid BETWEEN 2 AND 6 THEN g*100 + lid + 5 END AS matchupId,
               lid = 2 + (g+p) % 5 AS wasTargettedReceiver
        FROM trk WHERE lid >= 1
    )
"""


@query(
    "q91_bdb_pipeline",
    oracle=f"""
    WITH {_WORLD_SQL},
    base AS (
        SELECT t.*, p.dropbackDistance
        FROM trackingw t JOIN playsw p USING (gameId, playId)
        WHERE t.frameType = 'AFTER_SNAP' AND p.isDropback
    ),
    runners AS (
        SELECT r.gameId, r.playId, r.nflId, r.routeRan
        FROM ppw r WHERE r.wasRunningRoute
    ),
    runner_frames AS (
        SELECT b.gameId, b.playId, b.frameId, b.nflId, b.x, b.y, b.s
        FROM base b JOIN runners r USING (gameId, playId, nflId)
    ),
    defs AS (
        SELECT gameId, playId, frameId, x AS dx, y AS dy
        FROM base WHERE club = 'DEF'
    ),
    ball AS (SELECT * FROM base WHERE displayName = 'football'),
    pass_evt AS (
        SELECT gameId, playId,
               MAX(CASE WHEN event = 'pass_forward' THEN frameId END) AS fe
        FROM ball GROUP BY 1, 2
    ),
    release AS (
        SELECT b.gameId, b.playId, AVG(b.x) AS fx, AVG(b.y) AS fy
        FROM ball b JOIN pass_evt e USING (gameId, playId)
        WHERE b.frameId BETWEEN e.fe + 2 AND e.fe + 7
        GROUP BY 1, 2
    ),
    qbsw AS (
        SELECT DISTINCT pp.gameId, pp.playId, pl.displayName AS qb,
               pp.nflId AS qbId
        FROM ppw pp JOIN playersw pl ON pl.nflId = pp.nflId
        WHERE pl.position = 'QB'
    ),
    speeds AS (
        SELECT q.qb, MEDIAN(b.s) AS throw_speed
        FROM ball b
        JOIN pass_evt e USING (gameId, playId)
        JOIN qbsw q USING (gameId, playId)
        WHERE b.frameId BETWEEN e.fe + 2 AND e.fe + 7
        GROUP BY q.qb
    ),
    play_speed AS (
        SELECT q.gameId, q.playId, s.throw_speed
        FROM qbsw q JOIN speeds s USING (qb)
    ),
    rad1 AS (
        SELECT rf.*,
               COALESCE(ps.throw_speed, 18.0) AS bs,
               COALESCE(rl.fx, rf.x) AS bx,
               COALESCE(rl.fy, rf.y) AS byy
        FROM runner_frames rf
        LEFT JOIN release rl USING (gameId, playId)
        LEFT JOIN play_speed ps USING (gameId, playId)
    ),
    rad2 AS (
        SELECT *, sqrt((bx-x)*(bx-x) + (byy-y)*(byy-y)) AS wd FROM rad1
    ),
    rad3 AS (
        SELECT *, CASE WHEN bs <= s THEN {_R_CAP}
                       ELSE s*wd/(s+bs) END AS fr0
        FROM rad2
    ),
    rad4 AS (
        SELECT *,
               CASE WHEN wd = 0 THEN x ELSE x + fr0*((bx-x)/wd) END AS ix,
               CASE WHEN wd = 0 THEN y ELSE y + fr0*((byy-y)/wd) END AS iy
        FROM rad3
    ),
    rad5 AS (
        SELECT *, LEAST(GREATEST(ix, 0.0), 120.0) AS ccx,
                  LEAST(GREATEST(iy, 0.0), 53.3) AS ccy
        FROM rad4
    ),
    rad6 AS (
        SELECT *, sqrt((ccx-x)*(ccx-x) + (ccy-y)*(ccy-y)) AS frc FROM rad5
    ),
    radius AS (
        SELECT r.gameId, r.playId, r.nflId, r.frameId, r.y,
               CAST(COUNT(CASE WHEN
                   sqrt((d.dx-r.x)*(d.dx-r.x) + (d.dy-r.y)*(d.dy-r.y)) > r.frc
                   THEN 1 END) AS DOUBLE) AS open_count
        FROM rad6 r JOIN defs d USING (gameId, playId, frameId)
        GROUP BY r.gameId, r.playId, r.nflId, r.frameId, r.y
    ),
    snap AS (
        SELECT gameId, playId, nflId, y FROM (
            SELECT r.*, MIN(frameId) OVER (PARTITION BY gameId, playId) AS mnf
            FROM radius r
        ) WHERE frameId = mnf
    ),
    avg_open AS (
        SELECT gameId, playId, nflId, AVG(open_count) AS avg_openness
        FROM radius GROUP BY 1, 2, 3
    ),
    snap2 AS (
        SELECT s.gameId, s.playId, s.nflId, s.y, a.avg_openness
        FROM snap s JOIN avg_open a USING (gameId, playId, nflId)
    ),
    outside AS (
        SELECT * FROM (
            SELECT s.*, MIN(y) OVER (PARTITION BY gameId, playId) AS mny,
                   MAX(y) OVER (PARTITION BY gameId, playId) AS mxy
            FROM snap2 s
        ) WHERE y = mny OR y = mxy
    ),
    firstside AS (
        SELECT gameId, playId,
               CASE WHEN y = mny THEN 'L' ELSE 'R' END AS firstSide
        FROM (
            SELECT o.*, ROW_NUMBER() OVER (PARTITION BY gameId, playId
                       ORDER BY avg_openness DESC, nflId ASC) AS rn
            FROM outside o
        ) WHERE rn = 1
    ),
    ordered AS (
        SELECT s.gameId, s.playId, s.nflId,
               ROW_NUMBER() OVER (PARTITION BY s.gameId, s.playId
                   ORDER BY CASE WHEN f.firstSide = 'R' THEN -s.y ELSE s.y END,
                            s.nflId) AS read_order
        FROM snap2 s JOIN firstside f USING (gameId, playId)
    ),
    targets AS (
        SELECT gameId, playId,
               MAX(CASE WHEN read_order = 1 THEN nflId END) AS t1,
               MAX(CASE WHEN read_order = 2 THEN nflId END) AS t2,
               MAX(CASE WHEN read_order = 3 THEN nflId END) AS t3,
               MAX(CASE WHEN read_order = 4 THEN nflId END) AS t4,
               MAX(CASE WHEN read_order = 5 THEN nflId END) AS t5
        FROM ordered GROUP BY 1, 2
    ),
    qbtrk AS (
        SELECT t.gameId, t.playId, t.frameId, t.s, t.a, p.dropbackDistance
        FROM trackingw t
        JOIN playersw pl ON pl.nflId = t.nflId AND pl.position = 'QB'
        JOIN playsw p USING (gameId, playId)
        WHERE t.frameType = 'AFTER_SNAP'
          AND p.dropbackType NOT IN ({_ROLLOUTS})
    ),
    cum AS (
        SELECT *, SUM(s*0.1 + 0.5*a*{_DT2}) OVER (
                   PARTITION BY gameId, playId
                   ORDER BY frameId ROWS UNBOUNDED PRECEDING)
                   AS cumulative_distance
        FROM qbtrk
    ),
    timing AS (
        SELECT DISTINCT gameId, playId, dcf - mnf AS tdf FROM (
            SELECT gameId, playId,
                   MIN(CASE WHEN cumulative_distance >= dropbackDistance
                            THEN frameId END)
                       OVER (PARTITION BY gameId, playId) AS dcf,
                   MIN(frameId) OVER (PARTITION BY gameId, playId) AS mnf
            FROM cum
        )
    ),
    reads AS (
        SELECT gameId, playId, tdf AS r1, tdf+5 AS r2, tdf+10 AS r3,
               tdf+15 AS r4, tdf+20 AS r5
        FROM timing
    ),
    tf AS (
        SELECT gameId, playId,
               MAX(CASE WHEN event = 'pass_forward' THEN frameId END)
                 - MIN(frameId) AS throw_offset
        FROM trackingw WHERE frameType = 'AFTER_SNAP' GROUP BY 1, 2
    ),
    assigned AS (
        SELECT t.gameId, t.playId, r.r1, g.t1, g.t2, g.t3, g.t4, g.t5,
               list_position(
                 [abs(CAST(r.r1 AS DOUBLE) - t.throw_offset),
                  abs(CAST(r.r2 AS DOUBLE) - t.throw_offset),
                  abs(CAST(r.r3 AS DOUBLE) - t.throw_offset),
                  abs(CAST(r.r4 AS DOUBLE) - t.throw_offset),
                  abs(CAST(r.r5 AS DOUBLE) - t.throw_offset)],
                 list_min(
                 [abs(CAST(r.r1 AS DOUBLE) - t.throw_offset),
                  abs(CAST(r.r2 AS DOUBLE) - t.throw_offset),
                  abs(CAST(r.r3 AS DOUBLE) - t.throw_offset),
                  abs(CAST(r.r4 AS DOUBLE) - t.throw_offset),
                  abs(CAST(r.r5 AS DOUBLE) - t.throw_offset)])
               ) AS read_index
        FROM tf t JOIN reads r USING (gameId, playId)
        JOIN targets g USING (gameId, playId)
    ),
    expected AS (
        SELECT *, CASE read_index WHEN 1 THEN t1 WHEN 2 THEN t2
                       WHEN 3 THEN t3 WHEN 4 THEN t4 WHEN 5 THEN t5
                  END AS expected_receiver
        FROM assigned
    ),
    targeted AS (
        SELECT gameId, playId, nflId AS targeted_receiver
        FROM ppw WHERE wasTargettedReceiver
    ),
    pr AS (
        SELECT e.gameId, e.playId, q.qbId, q.qb,
               CASE WHEN tg.targeted_receiver = e.expected_receiver
                    THEN 1 ELSE 0 END AS is_exp,
               CASE WHEN e.read_index = 1 THEN 1 ELSE 0 END AS stuck,
               CASE WHEN tg.targeted_receiver = e.t1 THEN 1 ELSE 0 END AS threw1
        FROM expected e
        LEFT JOIN targeted tg USING (gameId, playId)
        JOIN qbsw q USING (gameId, playId)
    ),
    perqb AS (
        SELECT qbId AS nflId, qb,
               CAST(SUM(is_exp) AS DOUBLE)/COUNT(*) AS effective_read_percentage,
               CAST(SUM(stuck) AS DOUBLE)/COUNT(*) AS stuck_to_pre_rate,
               CAST(SUM(threw1) AS DOUBLE)/COUNT(*) AS throw_to_pre_rate,
               COUNT(*) AS snaps
        FROM pr GROUP BY 1, 2
    ),
    stats AS (
        SELECT AVG(effective_read_percentage) AS mu_eff,
               COALESCE(STDDEV_SAMP(effective_read_percentage), 1.0) AS sd_eff,
               AVG(throw_to_pre_rate) AS mu_pre,
               COALESCE(STDDEV_SAMP(throw_to_pre_rate), 1.0) AS sd_pre
        FROM perqb
    )
    SELECT p.nflId, p.qb, p.effective_read_percentage, p.stuck_to_pre_rate,
           p.throw_to_pre_rate, p.snaps,
           ROUND((p.effective_read_percentage - s.mu_eff)
                 / (CASE WHEN s.sd_eff = 0 THEN 1.0 ELSE s.sd_eff END)
               - (p.throw_to_pre_rate - s.mu_pre)
                 / (CASE WHEN s.sd_pre = 0 THEN 1.0 ELSE s.sd_pre END), 6)
             AS press,
           ROUND(CASE WHEN p.snaps >= 1 THEN
                 (p.effective_read_percentage - s.mu_eff)
                 / (CASE WHEN s.sd_eff = 0 THEN 1.0 ELSE s.sd_eff END)
               - (p.throw_to_pre_rate - s.mu_pre)
                 / (CASE WHEN s.sd_pre = 0 THEN 1.0 ELSE s.sd_pre END) END, 6)
             AS qualified_press
    FROM perqb p CROSS JOIN stats s
    """,
)
def q91_bdb_pipeline(spark, sf_dir):
    """The reference's whole pipeline, hash-checked end to end:
    `Openness_Data_Frame_Prep.R` → `radius_model.R` (closed-form
    field-clamped variant) → `BuildingReadOrder.R` → `QBReadStats.R`
    PRESS — executed through the REAL pipeline functions (the same ones
    run_dag wires), not reimplemented inline, so any wiring regression
    fails this oracle. PRESS/qualified_press are rounded to 6 decimals
    on both sides (stddev_samp association order differs between
    engines; the rates are exact int/int divisions and ship unrounded).
    """
    tracking, plays, players, player_play = _world(spark)
    cpd = openness_prep.build_cleaned_player_data(
        tracking, plays, players, player_play
    )
    radius = radius_stage.build_radius_data_closed_form(cpd)
    rd = read_order.reads_data(radius)
    timing = read_order.dropback_timing(tracking, plays, players)
    reads = qb_stats.play_reads(
        tracking, plays, player_play, players, timing, rd
    )
    press = qb_stats.press_data(reads)
    return press.select(
        "nflId",
        "qb",
        "effective_read_percentage",
        "stuck_to_pre_rate",
        "throw_to_pre_rate",
        "snaps",
        F.round(F.col("PRESS"), 6).alias("press"),
        F.round(F.col("qualified_press"), 6).alias("qualified_press"),
    )


# --- q92: the ML feature stage (X4 + feature engineering), hash-checked ----

#: mirrors ml._stddev_exact including its n=1 NULL guard (ANSI-safe)
_STD_SQL = (
    "CASE WHEN COUNT({c}) > 1 THEN "
    "SQRT((SUM({c}*{c}) - SUM({c})*SUM({c})/COUNT({c}))"
    "/(COUNT({c})-1)) END"
)


# cover_threshold.R's composed disguise stage (round 12, VERDICT item
# 4), re-derived in SQL over the SAME labeled frame: normalized labels
# (F4), the dynamic prob_<actual> lookup as a CASE over the
# class-bounded name set (F13), the confident-or-correct flag (F3),
# and the sum(dig) rollup (A12). The per-class probabilities are exact
# dyadic ratios of integer features, so every arithmetic step is
# bit-equal across engines.
_CT_NORM = "regexp_replace(pff_passCoverage, '[ -]', '.', 'g')"
_CT_PRED = (
    "CASE WHEN def_s_mean > 5.0 THEN pff_passCoverage "
    "ELSE 'Cover-1' END"
)
_CT_PRED_NORM = f"regexp_replace({_CT_PRED}, '[ -]', '.', 'g')"
_CT_OWN = (
    f"CASE {_CT_NORM} "
    "WHEN 'Cover.1' THEN down / 4.0 "
    "WHEN 'Cover.2' THEN yardsToGo / 16.0 "
    "WHEN 'Cover.3' THEN (playId % 5) / 8.0 "
    "WHEN 'Quarters' THEN n_defenders / 8.0 END"
)
_CT_DIG = (
    f"CASE WHEN {_CT_NORM} = {_CT_PRED_NORM} THEN 0 "
    f"WHEN {_CT_OWN} > 0.8 THEN 0 "
    f"WHEN {_CT_OWN} <= 0.8 THEN 1 END"
)


@query(
    "q92_ml_features",
    oracle=f"""
    WITH {_WORLD_SQL},
    defs AS (
        SELECT gameId, playId, nflId, x, y, s
        FROM trackingw WHERE club = 'DEF'
    ),
    agg AS (
        SELECT gameId, playId,
               AVG(x) AS def_x_mean, {_STD_SQL.format(c='x')} AS def_x_std,
               AVG(y) AS def_y_mean, {_STD_SQL.format(c='y')} AS def_y_std,
               AVG(s) AS def_s_mean, {_STD_SQL.format(c='s')} AS def_s_std,
               COUNT(DISTINCT nflId) AS n_defenders
        FROM defs GROUP BY 1, 2
    ),
    feats AS (
        SELECT a.*, p.down, p.yardsToGo, p.absoluteYardlineNumber,
               p.preSnapHomeScore - p.preSnapVisitorScore AS score_diff,
               p.pff_passCoverage
        FROM agg a JOIN playsw p USING (gameId, playId)
        WHERE p.pff_passCoverage IS NOT NULL
    ),
    counts AS (
        SELECT pff_passCoverage, COUNT(*) AS c FROM feats GROUP BY 1
    ),
    lidx AS (
        SELECT pff_passCoverage,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY c DESC, pff_passCoverage ASC) - 1 AS DOUBLE)
                 AS label_index
        FROM counts
    )
    ,
    labeled AS (
        SELECT f.*, l.label_index,
               CASE WHEN f.def_s_mean > 5.0 THEN 1.0 ELSE 0.0 END AS pred
        FROM feats f JOIN lidx l USING (pff_passCoverage)
    ),
    -- X8 per-class report (round 11): exact int-ratio divisions; a
    -- class the binary rule never predicts has NULL precision/F1
    repl AS (
        SELECT label_index, COUNT(*) AS support,
               SUM(CASE WHEN pred = label_index THEN 1 ELSE 0 END) AS tp
        FROM labeled GROUP BY 1
    ),
    repp AS (
        SELECT pred AS label_index, COUNT(*) AS pred_n
        FROM labeled GROUP BY 1
    ),
    report AS (
        SELECT r.label_index,
               CAST(r.tp AS DOUBLE) / p.pred_n AS x8_precision,
               CAST(r.tp AS DOUBLE) / r.support AS x8_recall
        FROM repl r LEFT JOIN repp p USING (label_index)
    ),
    reportf AS (
        SELECT label_index, x8_precision, x8_recall,
               CASE WHEN x8_precision + x8_recall > 0
                    THEN 2.0 * x8_precision * x8_recall
                         / (x8_precision + x8_recall) END AS x8_f1
        FROM report
    ),
    -- X6 trained-model predictions, PINNED: both boosted families are
    -- refitted at query time on the deterministic sorted frame; these
    -- literals were produced by that exact fit (hash-verified across
    -- session configs) — trainer drift flips the whole query red
    x6 AS (
        SELECT CAST(gameId AS BIGINT) AS gameId,
               CAST(playId AS BIGINT) AS playId,
               x6_gbdt_label,
               CAST(x6_gbdt_prob_micro AS BIGINT) AS x6_gbdt_prob_micro,
               x6_lgbm_label,
               CAST(x6_lgbm_prob_micro AS BIGINT) AS x6_lgbm_prob_micro,
               x6_catb_label,
               CAST(x6_catb_prob_micro AS BIGINT) AS x6_catb_prob_micro,
               x6_cts_label,
               CAST(x6_cts_prob_micro AS BIGINT) AS x6_cts_prob_micro
        FROM (VALUES
            (0, 0, 'Cover-3', 384240, 'Cover-1', 836298, 'Cover-1', 820655, 'Cover-3', 604927),
            (0, 1, 'Cover-2', 631473, 'Cover-2', 911899, 'Cover-2', 967111, 'Cover-3', 944276),
            (0, 2, 'Cover-3', 745212, 'Cover-3', 902226, 'Cover-3', 983056, 'Cover-2', 884606),
            (0, 3, 'Quarters', 838360, 'Quarters', 920362, 'Quarters', 987571, 'Cover-2', 946439),
            (1, 0, 'Cover-2', 516661, 'Cover-2', 906492, 'Cover-2', 996451, 'Cover-3', 883363),
            (1, 1, 'Cover-3', 653283, 'Cover-3', 902226, 'Cover-3', 984866, 'Cover-3', 866767),
            (1, 2, 'Quarters', 681844, 'Quarters', 886416, 'Quarters', 989176, 'Quarters', 797418),
            (1, 3, 'Cover-1', 577856, 'Cover-1', 860318, 'Cover-1', 846253, 'Cover-2', 995935),
            (2, 0, 'Cover-3', 455674, 'Cover-3', 885127, 'Cover-3', 939007, 'Cover-3', 953521),
            (2, 1, 'Quarters', 702333, 'Quarters', 955979, 'Quarters', 976457, 'Quarters', 989311),
            (2, 2, 'Cover-1', 635186, 'Cover-1', 921244, 'Cover-1', 998084, 'Cover-2', 991442),
            (2, 3, 'Cover-2', 609705, 'Cover-2', 863167, 'Cover-2', 986406, 'Cover-2', 995598),
            (3, 0, 'Cover-1', 441503, 'Quarters', 783250, 'Quarters', 692902, 'Quarters', 604227),
            (3, 1, 'Cover-2', 517798, 'Cover-1', 884578, 'Cover-1', 932945, 'Cover-1', 532540),
            (3, 2, 'Cover-2', 606255, 'Cover-2', 942799, 'Cover-2', 995606, 'Cover-2', 990725),
            (3, 3, 'Cover-3', 689159, 'Cover-3', 884892, 'Cover-3', 987909, 'Cover-2', 718842),
            (4, 0, 'Cover-1', 676698, 'Cover-1', 901993, 'Cover-1', 957497, 'Cover-1', 606180),
            (4, 1, 'Cover-2', 598212, 'Cover-2', 940279, 'Cover-2', 997585, 'Quarters', 473277),
            (4, 2, 'Cover-3', 685914, 'Cover-3', 915930, 'Cover-3', 999368, 'Cover-2', 874815),
            (4, 3, 'Quarters', 655434, 'Quarters', 912884, 'Quarters', 970021, 'Cover-2', 943467),
            (5, 0, 'Cover-2', 679355, 'Cover-2', 917590, 'Cover-2', 985802, 'Cover-3', 982714),
            (5, 1, 'Cover-3', 779655, 'Cover-3', 953869, 'Cover-3', 957033, 'Cover-3', 994405),
            (5, 2, 'Quarters', 711927, 'Quarters', 883510, 'Quarters', 987791, 'Cover-2', 887064)
        ) AS t(gameId, playId, x6_gbdt_label, x6_gbdt_prob_micro,
               x6_lgbm_label, x6_lgbm_prob_micro,
               x6_catb_label, x6_catb_prob_micro,
               x6_cts_label, x6_cts_prob_micro)
    )
    SELECT *,
           ROUND((def_x_mean - AVG(def_x_mean) OVER ())
                 / STDDEV_SAMP(def_x_mean) OVER (), 6) AS def_x_mean_scaled,
           ROUND((yardsToGo - AVG(yardsToGo) OVER ())
                 / STDDEV_SAMP(yardsToGo) OVER (), 6) AS yards_to_go_scaled,
           COUNT(*) OVER (PARTITION BY label_index, pred) AS confusion_n,
           ROUND(CAST(SUM(CASE WHEN pred = label_index THEN 1 ELSE 0 END)
                          OVER () AS DOUBLE)
                 / COUNT(*) OVER (), 6) AS accuracy,
           CASE WHEN gameId = 0 AND playId = 0 THEN
                CASE WHEN def_s_mean > 5.0 THEN 0.75 ELSE 0.25 END
           END AS x9_prob_cover1,
           CASE WHEN gameId = 0 AND playId = 0 THEN
                1.0 - CASE WHEN def_s_mean > 5.0 THEN 0.75 ELSE 0.25 END
           END AS x9_prob_other,
           down / 4.0 + yardsToGo / 16.0 + (playId % 5) / 8.0
               + n_defenders / 8.0 AS ct_prob_sum,
           {_CT_DIG} AS ct_disguised,
           CAST(SUM({_CT_DIG}) OVER () AS BIGINT) AS ct_n_disguised
    FROM labeled JOIN x6 USING (gameId, playId)
         JOIN reportf USING (label_index)
    """,
)
def q92_ml_features(spark, sf_dir):
    """X4 + the ML feature stage, driver-verified (round-4 VERDICT
    item 6: the ML layer had only local tests): `coverage_features`
    (`ml.py`; `DefCoverage.ipynb` cells 1-4) over the q91 synthetic
    world, plus a REAL `StringIndexer` fit (X4, `DefCoverage.ipynb`
    cell 5's LabelEncoder) whose frequencyDesc/alphabetical-tie
    semantics the oracle reproduces as a SQL window. Every feature is
    exact dyadic arithmetic (see `_stddev_exact`), so the whole table
    value-hash-matches — no tolerance bands.

    Round 6 widens the same rows with the REST of the deterministic ML
    slab (VERDICT r05: X7/X8 were driver-untested):

    - X7: a real MLlib `StandardScaler` (withMean) fit over the
      assembled feature vector; two scaled components are projected
      back out, rounded to 6 dp on both sides (the q91 precedent:
      Summarizer's tree-aggregated mean/std and the oracle's window
      AVG/STDDEV_SAMP agree to well under 1e-6).
    - X8: a real `MulticlassClassificationEvaluator` accuracy and the
      real `ml.confusion_matrix` pivot, computed over a DETERMINISTIC
      rule prediction (def_s_mean threshold) — the metrics CODE gets
      a hash-checked driver row; the pivoted confusion matrix is
      melted back to a per-row `confusion_n` (this row's (label,
      pred) cell count) so granularity still matches the feature
      table.
    - X6 (round 11): TRAINED MODELS under the oracle at last — the
      `NumpyGBDTClassifier` (XGBoost algorithm) and
      `NumpyLGBMClassifier` (LightGBM leaf-wise histogram algorithm)
      are refitted at query time on the deterministically-ordered
      23-row frame (`DefPosModel.ipynb` cells 4-16's fit+predict);
      per-row predicted labels + micro-unit max-class probabilities
      are value-hash-checked against pinned VALUES (the q64
      'bpe_train' pattern). Training is RNG-free with pinned
      tie-breaks, so refits are bit-identical — the literals ARE the
      contract, not a tolerance band."""
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.feature import StandardScaler, StringIndexer, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    tracking, plays, players, _pp = _world(spark)
    from ..ml import confusion_matrix, coverage_features

    feats = coverage_features(tracking, plays, players)
    idx = StringIndexer(
        inputCol="pff_passCoverage",
        outputCol="label_index",
        stringOrderType="frequencyDesc",
    ).fit(feats)
    base = idx.transform(feats).select(
        "gameId", "playId",
        "def_x_mean", "def_x_std", "def_y_mean", "def_y_std",
        "def_s_mean", "def_s_std", "n_defenders",
        "down", "yardsToGo", "absoluteYardlineNumber", "score_diff",
        "pff_passCoverage", "label_index",
    ).withColumn(
        "pred",
        F.when(F.col("def_s_mean") > 5.0, 1.0).otherwise(0.0),
    )

    # X7: real scaler over (def_x_mean, yardsToGo); components back out
    assembled = VectorAssembler(
        inputCols=["def_x_mean", "yardsToGo"], outputCol="__raw"
    ).transform(base)
    scaler = StandardScaler(
        inputCol="__raw", outputCol="__scaled", withMean=True
    ).fit(assembled)
    scaled = scaler.transform(assembled).withColumn(
        "__arr", vector_to_array("__scaled")
    ).select(
        *base.columns,
        F.round(F.col("__arr")[0], 6).alias("def_x_mean_scaled"),
        F.round(F.col("__arr")[1], 6).alias("yards_to_go_scaled"),
    )

    # X8: evaluator accuracy (a scalar: same value on every row) and
    # the confusion-matrix pivot, melted back onto the rows
    acc = MulticlassClassificationEvaluator(
        labelCol="label_index", predictionCol="pred",
        metricName="accuracy",
    ).evaluate(base)
    cm = confusion_matrix(
        base.select(
            F.col("label_index").alias("label"),
            F.col("pred").alias("prediction"),
        )
    )
    # pivot names columns after the prediction VALUES ("0.0", "1.0");
    # backticks keep unpivot from parsing the dot as struct nesting
    pred_cols = [f"`{c}`" for c in cm.columns if c != "label"]
    cm_long = cm.unpivot(
        ["label"], pred_cols, "__pred_s", "confusion_n"
    ).select(
        F.col("label").alias("label_index"),
        F.col("__pred_s").cast("double").alias("pred"),
        "confusion_n",
    )
    # X8 widening (round 11): the per-class precision/recall/F1 table
    # (`ml.classification_report`) over the same deterministic rule
    # pred, melted back per row by label_index — exact int-ratio IEEE
    # divisions, so the oracle re-derives them bit-for-bit (classes
    # the binary rule never predicts carry NULL precision/F1, the
    # documented "undefined ≠ zero" contract)
    from ..ml import classification_report

    x8_rep = classification_report(
        base.select(
            F.col("label_index").alias("label"),
            F.col("pred").alias("prediction"),
        )
    ).select(
        F.col("label").alias("label_index"),
        F.col("precision").alias("x8_precision"),
        F.col("recall").alias("x8_recall"),
        F.col("f1").alias("x8_f1"),
    )

    # X9 (round 9, VERDICT item 5): per-play inference through the
    # REAL `ml.predict_for_play` path with the deterministic
    # `RuleCoverageModel` — filter-first scoring of play (0, 0), class
    # probabilities emitted as a map and projected back out by key
    # (rows of other plays carry NULL), so the inference path is
    # value-hash-checked instead of pytest-only. Fitted-model scoring
    # through the same function stays in tests/test_ml.py.
    from ..ml import RuleCoverageModel, predict_for_play

    x9 = predict_for_play(RuleCoverageModel(), base, 0, 0).select(
        "gameId",
        "playId",
        F.col("probabilities")["Cover-1"].alias("x9_prob_cover1"),
        F.col("probabilities")["other"].alias("x9_prob_other"),
    )
    # X6 (round 11, VERDICT item 1): TRAINED models under the driver
    # oracle — the last local-only §2 component. Both NumPy boosted
    # families (GBDT = the XGBoost algorithm; LGBM = leaf-wise
    # histogram, the LightGBM algorithm) are FITTED AT QUERY TIME on
    # the deterministically-ORDERED 23-row feature table and their
    # per-row predictions ride the output as pinned-VALUES-checked
    # columns (the q64 'bpe_train' pattern: any trainer drift — a
    # split moving, a leaf weight changing — flips rows red). The fit
    # is a pure function of the sorted frame (no RNG, lowest-feature/
    # lowest-threshold tie-breaks), so the probabilities are
    # bit-stable and micro-unit rounding is exact, not a tolerance.
    from ..ml import (
        NumpyCatBoostClassifier,
        NumpyGBDTClassifier,
        NumpyLGBMClassifier,
    )

    fit_cols = ["def_s_mean", "def_x_mean", "yardsToGo", "down"]
    train_frame = base.orderBy("gameId", "playId")
    x6_models = [
        ("gbdt", NumpyGBDTClassifier(
            "pff_passCoverage", fit_cols, n_rounds=20
        ).fit(train_frame)),
        ("lgbm", NumpyLGBMClassifier(
            "pff_passCoverage", fit_cols, n_rounds=20, num_leaves=4
        ).fit(train_frame)),
        # round 11 late: the oblivious-tree ordered-boosting family
        # rides the same pinned-VALUES oracle (seed-pinned permutation
        # → bit-identical refits like its siblings)
        ("catb", NumpyCatBoostClassifier(
            "pff_passCoverage", fit_cols, n_rounds=20, depth=3
        ).fit(train_frame)),
    ]
    # round 12: CatBoost's ORDERED TARGET STATISTICS under the same
    # pinned-VALUES oracle — `down` becomes a true categorical (string
    # cast) encoded as leakage-free per-class prefix shares over TWO
    # alternating permutations (n_permutations=2); the fit is still a
    # pure function of the sorted frame (seed-pinned rng), so drift in
    # the TS math, the permutation schedule, or the inference-side
    # full-data statistics flips rows red.
    cts_frame = train_frame.withColumn(
        "down_cat", F.col("down").cast("string")
    )
    x6_models.append((
        "cts",
        NumpyCatBoostClassifier(
            "pff_passCoverage",
            ["def_s_mean", "def_x_mean", "yardsToGo"],
            n_rounds=20, depth=3,
            cat_feature_cols=["down_cat"], n_permutations=2,
        ).fit(cts_frame),
    ))
    score_frames = {"cts": base.withColumn(
        "down_cat", F.col("down").cast("string")
    )}
    x6_scores = [
        m.transform(score_frames.get(tag, base)).select(
            "gameId",
            "playId",
            F.col("predicted_label").alias(f"x6_{tag}_label"),
            F.round(
                F.element_at("probabilities", F.col("predicted_label"))
                * 1e6
            ).cast("bigint").alias(f"x6_{tag}_prob_micro"),
        )
        for tag, m in x6_models
    ]
    out = (
        scaled.join(F.broadcast(cm_long), ["label_index", "pred"])
        .join(F.broadcast(x8_rep), ["label_index"])
        .join(F.broadcast(x9), ["gameId", "playId"], "left")
        .select(
            *[c for c in scaled.columns],
            F.col("confusion_n").cast("bigint").alias("confusion_n"),
            # F.round (HALF_UP) matches DuckDB ROUND; Python's round
            # would bankers-round ties differently
            F.round(F.lit(acc), 6).alias("accuracy"),
            "x8_precision",
            "x8_recall",
            "x8_f1",
            "x9_prob_cover1",
            "x9_prob_other",
        )
    )
    for sc in x6_scores:
        out = out.join(F.broadcast(sc), ["gameId", "playId"])
    # cover_threshold.R's COMPOSED disguise stage (round 12, VERDICT
    # item 4 — the last reference script gets its one-call twin,
    # `pipelines.cover_threshold.disguise_data`): a deterministic
    # predictions frame rides the q92 oracle — per-class probabilities
    # are exact dyadic feature ratios and the predicted label reuses
    # the def_s_mean rule, so the oracle re-derives the FULL walk
    # (normalize → dynamic lookup → flag → rollup) instead of pinning
    # VALUES; drift in any stage flips the rows red.
    from ..pipelines.cover_threshold import disguise_data

    ct_preds = base.select(
        "gameId",
        "playId",
        F.col("pff_passCoverage").alias("actual_coverage"),
        F.when(F.col("def_s_mean") > 5.0, F.col("pff_passCoverage"))
        .otherwise(F.lit("Cover-1"))
        .alias("predicted_coverage"),
        (F.col("down") / F.lit(4.0)).alias("prob_Cover-1"),
        (F.col("yardsToGo") / F.lit(16.0)).alias("prob_Cover-2"),
        ((F.col("playId") % 5) / F.lit(8.0)).alias("prob_Cover-3"),
        (F.col("n_defenders") / F.lit(8.0)).alias("prob_Quarters"),
    )
    ct = disguise_data(ct_preds).select(
        "gameId",
        "playId",
        F.col("prob_sum").alias("ct_prob_sum"),
        F.col("disguised").alias("ct_disguised"),
        F.col("n_disguised").alias("ct_n_disguised"),
    )
    return out.join(F.broadcast(ct), ["gameId", "playId"])

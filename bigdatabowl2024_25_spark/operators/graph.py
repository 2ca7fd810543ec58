"""Link-graph centrality — fixed-point PageRank.

Why it's here: large-scale corpus pipelines weight domains by
web-graph centrality (Common Crawl publishes harmonic-centrality
ranks; the original PageRank paper is the ancestor of all of them),
and a quality-mixing stage wants that signal next to the dedup/quality
operators. The reference has no graph layer; its nearest analog is the
iterative convergence loop of `radius_model.R` — same structural
problem (a per-round global fixpoint), which `components.py` already
solves for connected components. PageRank adds the weighted-propagation
variant.

Determinism: ranks are **scaled integers** (``rank ≈ pagerank ×
scale``). Every operation is integer arithmetic — ``div`` for the
per-edge share, exact bigint sums, damping as a ``num/den`` rational —
so the result is bit-identical on any engine and partitioning, and a
DuckDB oracle can re-derive it with the same unrolled arithmetic
(float PageRank would die on order-dependent double sums). The floor
divisions leak ≤1 unit of mass per node per round — a ~1e-9 relative
perturbation at the default scale, irrelevant for a ranking signal and
the price of exactness.

Scale: per iteration, one shuffle for the contribution aggregate
(``groupBy(dst)``) and one keyed join of ranks onto edges — the same
join every round, so pre-partitioning/bucketing both sides by node id
makes the per-round shuffle a map-side zip at cluster scale. Out-degree
and the node list are computed once. The dangling mass is a 1-row
aggregate broadcast back (crossJoin of a scalar). Plan depth grows
linearly per round, and each rank is referenced twice (contributions +
dangling), so rounds beyond ``eager_every`` are cut with
``localCheckpoint`` exactly like ``components.py``'s min-label loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank unit: 1.0 of probability mass == SCALE units
DEFAULT_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 3,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = DEFAULT_SCALE,
    eager_every: int = 4,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list.

    ``edges`` must already be distinct (src, dst) pairs — multigraph
    weighting is the caller's policy decision. Returns
    ``(node, rank_scaled)`` where ``rank_scaled / scale`` approximates
    the PageRank probability with damping ``damping_num/damping_den``
    (default 17/20 = 0.85). Dangling nodes (no out-edges) redistribute
    their mass uniformly, the standard correction.

    Per round, for previous ranks r:
        share(e)  = r[e.src] div outdeg[e.src]
        contrib(v)= Σ share(e) over e.dst = v           (exact bigint)
        dangling  = Σ r[v] over v with outdeg 0
        r'(v)     = (den-num)·scale div (den·N)
                    + num·(contrib(v) + dangling div N) div den

    Every round past ``eager_every`` is materialized with
    ``localCheckpoint`` so the doubly-referenced rank lineage cannot
    grow exponentially (same guard as `components.connected_components`;
    the driver-facing q74 branch stays at 3 lazy rounds).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # The edge list is read 3 + iterations times (node list twice,
    # out-degree, one share-join per round). Materialize it once to
    # executor-local storage instead of re-deriving the upstream
    # subtree per reference — the same cut GraphX makes; for
    # fault-tolerant long runs route the INPUT through a reliable
    # checkpoint first (components.connected_components pattern).
    e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )
    # node list + degree are reused every round: keep them one plan
    base = nodes.join(outdeg, "node", "left").select(
        "node", F.coalesce("deg", F.lit(0)).alias("deg")
    )
    base = base.localCheckpoint(eager=False)
    n_nodes = base.agg(F.count("*").alias("n"))

    teleport_num = (damping_den - damping_num) * scale
    ranks = base.join(n_nodes).select(
        "node",
        "deg",
        F.expr(f"{scale} div n").alias("rank_scaled"),
        "n",
    )
    for i in range(iterations):
        shares = e.join(
            ranks.select(
                F.col("node").alias("src"), "deg", "rank_scaled"
            ),
            "src",
        ).select("dst", F.expr("rank_scaled div deg").alias("share"))
        contrib = shares.groupBy(F.col("dst").alias("node")).agg(
            F.sum("share").alias("contrib")
        )
        dangling = ranks.filter(F.col("deg") == 0).agg(
            F.coalesce(F.sum("rank_scaled"), F.lit(0)).alias("dm")
        )
        ranks = (
            ranks.select("node", "deg", "n")
            .join(contrib, "node", "left")
            .join(dangling)
            .select(
                "node",
                "deg",
                "n",
                (
                    F.expr(f"{teleport_num} div ({damping_den} * n)")
                    + F.expr(
                        f"{damping_num} * (coalesce(contrib, 0)"
                        f" + (dm div n)) div {damping_den}"
                    )
                ).alias("rank_scaled"),
            )
        )
        # Each round references the previous ranks THREE times (share
        # join, dangling aggregate, next-round base), so a lazy plan
        # TRIPLES per round — 3^n subtree copies (observed: 9 KB → 28
        # KB per extra round; the composed-pipeline OOM lesson from
        # pipelines/corpus._fanout applies). A lazy localCheckpoint
        # truncates the logical plan NOW and materializes at first
        # use, keeping per-round plan size constant; `eager_every`
        # additionally forces materialization so a failure mid-chain
        # never recomputes more than that many rounds.
        if (i + 1) < iterations:
            ranks = ranks.localCheckpoint(
                eager=((i + 1) % eager_every == 0)
            )
    return ranks.select("node", "rank_scaled")


def oracle_pagerank_sql(
    edges_cte: str,
    *,
    iterations: int = 3,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = DEFAULT_SCALE,
) -> str:
    """DuckDB CTE block re-deriving `pagerank` by unrolled iteration.

    ``edges_cte`` must be a SELECT yielding distinct (src, dst).
    Emits CTEs ``pr_edges/pr_base/pr_n/pr_r0..pr_r{k}``; the final
    ranks are ``SELECT node, r AS rank_scaled FROM pr_r{k}``. Integer
    ``//`` in DuckDB and ``div`` in Spark agree on the non-negative
    values used here.
    """
    tele = (damping_den - damping_num) * scale
    parts = [
        f"pr_edges AS ({edges_cte})",
        """pr_base AS (
            SELECT node, COALESCE(deg, 0) AS deg FROM (
                SELECT src AS node FROM pr_edges
                UNION SELECT dst FROM pr_edges
            ) nn LEFT JOIN (
                SELECT src, COUNT(*) AS deg FROM pr_edges GROUP BY src
            ) d ON d.src = nn.node
        )""",
        "pr_n AS (SELECT COUNT(*) AS n FROM pr_base)",
        f"pr_r0 AS (SELECT node, deg, CAST({scale} // n AS BIGINT) AS r"
        " FROM pr_base, pr_n)",
    ]
    for i in range(1, iterations + 1):
        p = f"pr_r{i - 1}"
        parts.append(
            f"""pr_c{i} AS (
            SELECT e.dst AS node, CAST(SUM(r.r // r.deg) AS BIGINT) AS c
            FROM pr_edges e JOIN {p} r ON r.node = e.src
            GROUP BY e.dst
        )"""
        )
        parts.append(
            f"""pr_d{i} AS (
            SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dm
            FROM {p} WHERE deg = 0
        )"""
        )
        parts.append(
            f"""pr_r{i} AS (
            SELECT b.node, b.deg,
                   CAST({tele} // ({damping_den} * pr_n.n)
                        + {damping_num} * (COALESCE(c.c, 0)
                          + (pr_d{i}.dm // pr_n.n)) // {damping_den}
                        AS BIGINT) AS r
            FROM pr_base b
            LEFT JOIN pr_c{i} c ON c.node = b.node, pr_n, pr_d{i}
        )"""
        )
    return ",\n".join(parts)

"""Connected components by iterative min-label propagation — the
clustering stage of the dedup pipeline (near-dup PAIRS from LSH/
Jaccard become GROUPS; one keeper survives per group).

Each round every node adopts the minimum label among itself and its
neighbors; convergence takes O(component diameter) rounds — near-dup
clusters are shallow (pairs all share a common origin), so a handful
of rounds suffices at any corpus size. Each round is one join + one
aggregate on the node key; intermediate labels are persisted so the
lineage doesn't grow exponentially across iterations (the classic
iterative-Spark footgun).

This is the small-diameter regime of connected components; for
general graphs with long chains use the large-star/small-star
algorithm — same primitive operations, fewer rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _release_checkpoint(df: DataFrame) -> None:
    """Free a superseded localCheckpoint's executor-storage blocks.
    `DataFrame.unpersist()` doesn't reach them (the plan is a
    LogicalRDD leaf, not a cached plan), so this goes through the
    leaf's underlying RDD. Best-effort across Spark minor versions:
    on any internal-API drift the blocks are instead reclaimed by the
    ContextCleaner when the driver GCs the reference — later, but
    still bounded."""
    try:
        df._jdf.queryExecution().optimizedPlan().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, component) for every node in `edges`, component = min
    node id reachable. Converges early when a round changes nothing.

    persist() keeps each round's DATA from recomputing, but the logical
    plan still deepens linearly with rounds — on a long-chain graph
    (diameter ≈ max_iter) the planner cost itself becomes the
    bottleneck, so every `checkpoint_every` rounds the labels are
    localCheckpoint()ed, truncating lineage to a leaf.

    Checkpoint lifecycle: `unpersist()` is a NO-OP on a checkpointed
    DataFrame, so superseded checkpoint blocks would pile up in
    executor storage across long runs; each eager checkpoint therefore
    explicitly releases the previous one (safe: eager ⇒ the new
    blocks are fully materialized before the old lineage anchor is
    dropped). The newest checkpoint backs the RETURNED DataFrame and
    is left alive — its blocks are freed when the caller drops the
    result and the ContextCleaner collects it. Trade-off (vs reliable
    `checkpoint()` to a checkpoint dir): localCheckpoint blocks live
    in executor storage, so losing an executor mid-run loses them
    unrecoverably — lineage was truncated, there is nothing to
    recompute from. Fine on local[n] and for restartable batch jobs;
    a 1000-executor production run should call
    `sc.setCheckpointDir(...)` and swap in `.checkpoint()`."""
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.distinct().persist()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    last_cp: DataFrame | None = None
    for i in range(max_iter):
        msgs = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), "component")
        )
        # the node's own (old) label rides through the min-agg as a
        # second column, so convergence is a filter on the aggregated
        # table — NOT an extra new⋈old join per round. In an
        # all-scheduling-overhead loop (labels are tiny next to the
        # cluster) that join was ~a third of every round's wall time.
        new_full = (
            labels.select(
                "node", "component", F.col("component").alias("old")
            )
            .unionByName(
                msgs.select(
                    "node", "component", F.lit(None).cast("long").alias("old")
                )
            )
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min("old").alias("old"),
            )
        )
        release_at_round_end = None
        if (i + 1) % checkpoint_every == 0:
            # eager: truncates the logical plan AND materializes
            new_full = new_full.localCheckpoint()
            # the old checkpoint can only be released at round end:
            # this round's changed-count reads the previous round's
            # labels, whose (possibly partially-cached) lineage
            # anchors on the old checkpoint
            release_at_round_end = last_cp
            last_cp = new_full
        else:
            new_full = new_full.persist()
        changed = (
            new_full.filter(F.col("component") < F.col("old"))
            .limit(1)
            .count()
        )
        # unpersist the cached frame itself, not a projection of it
        # (unpersist on a derived DataFrame is a no-op)
        labels.unpersist()
        labels = new_full
        if release_at_round_end is not None:
            _release_checkpoint(release_at_round_end)
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", "component")

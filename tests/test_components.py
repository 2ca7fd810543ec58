"""connected_components: correctness on adversarial graph shapes and
the lineage-truncation (localCheckpoint) path.

The oracle-gated q74 covers the realistic shallow near-dup clusters;
these tests cover the shapes that stress the ITERATION itself — a long
chain whose diameter forces many rounds straight through several
checkpoint boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatabowl2024_25_spark.operators.components import connected_components


def _labels(df):
    return {r.node: r.component for r in df.collect()}


def test_long_chain_through_checkpoints(spark):
    """A 0-1-2-...-24 path graph: diameter 24, min-label needs many
    rounds, crossing the every-5-rounds localCheckpoint repeatedly.
    Every node must still land in component 0."""
    n = 25
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = _labels(connected_components(edges, max_iter=n))
    assert out == {i: 0 for i in range(n)}


def test_two_chains_and_a_clique(spark):
    """Mixed shapes in one edge set: two disjoint chains + a clique;
    components must not leak across."""
    chain_a = [(i, i + 1) for i in range(0, 9)]          # 0..9
    chain_b = [(i, i + 1) for i in range(100, 109)]      # 100..109
    clique = [(a, b) for a in range(200, 205) for b in range(a + 1, 205)]
    edges = spark.createDataFrame(
        chain_a + chain_b + clique, "id_a long, id_b long"
    )
    out = _labels(connected_components(edges, max_iter=15))
    assert all(out[i] == 0 for i in range(10))
    assert all(out[i] == 100 for i in range(100, 110))
    assert all(out[i] == 200 for i in range(200, 205))


def test_early_convergence_star(spark):
    """A star graph converges in one round regardless of size — the
    early-exit must fire long before max_iter."""
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 40)], "id_a long, id_b long"
    )
    out = _labels(connected_components(edges, max_iter=20))
    assert set(out.values()) == {0}


def test_checkpoint_cadence_is_semantics_free(spark):
    """Different checkpoint cadences give identical results — the
    truncation never changes semantics. (There is deliberately no
    un-checkpointed control at this depth: every round references the
    previous labels twice, so an untruncated logical plan DOUBLES per
    round and ~8 checkpoint-free rounds OOM a 1 GB driver on plan
    metadata alone — measured here; that failure mode is exactly why
    checkpoint_every exists.)"""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    a = _labels(connected_components(edges, max_iter=8, checkpoint_every=1))
    b = _labels(connected_components(edges, max_iter=8, checkpoint_every=2))
    c = _labels(connected_components(edges, max_iter=8, checkpoint_every=5))
    assert a == b == c == {i: 0 for i in range(7)}

"""Fixed-point PageRank: integer-exact semantics, partition
invariance, oracle-SQL generator parity.

Parity query: q74 'pagerank' branch scores the customer→supplier
bipartite graph at sf0.01 against `oracle_pagerank_sql`'s unrolled
DuckDB arithmetic; these tests pin the operator on a hand graph where
the reference walk is computed in pure Python with the same integer
recurrence.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from bigdatabowl2024_25_spark.operators.graph import (
    DEFAULT_SCALE,
    oracle_pagerank_sql,
    pagerank,
)

#: a small web: 1 is the hub (2 and 3 both link to it); 4 and 5 are
#: dangling sinks fed by the hub, so the dangling-mass path matters
EDGES = [(2, 1), (3, 1), (3, 2), (2, 3), (1, 4), (1, 5)]


def ref_pagerank(edges, iterations, scale=DEFAULT_SCALE, num=17, den=20):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = Counter(s for s, _ in edges)
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        contrib = defaultdict(int)
        for s, d in edges:
            contrib[d] += r[s] // outdeg[s]
        dm = sum(r[v] for v in nodes if outdeg[v] == 0)
        tele = (den - num) * scale // (den * n)
        r = {v: tele + num * (contrib[v] + dm // n) // den for v in nodes}
    return r


def test_pagerank_matches_python_reference(spark):
    df = spark.createDataFrame(EDGES, "src bigint, dst bigint")
    for iters in (1, 3):
        got = {
            r.node: r.rank_scaled
            for r in pagerank(df, iterations=iters).collect()
        }
        assert got == ref_pagerank(EDGES, iters)


def test_pagerank_partition_invariance_and_checkpoint_path(spark):
    df = spark.createDataFrame(EDGES, "src bigint, dst bigint")
    want = ref_pagerank(EDGES, 6)
    for parts in (1, 5):
        got = {
            r.node: r.rank_scaled
            for r in pagerank(
                df.repartition(parts), iterations=6, eager_every=2
            ).collect()
        }
        assert got == want


def test_pagerank_mass_and_ordering(spark):
    df = spark.createDataFrame(EDGES, "src bigint, dst bigint")
    got = {
        r.node: r.rank_scaled for r in pagerank(df, iterations=8).collect()
    }
    # floor divisions only ever LOSE mass, ≤ a few units per node/round
    assert 0.99 * DEFAULT_SCALE < sum(got.values()) <= DEFAULT_SCALE
    # node 1 is the hub: everyone links to it
    assert got[1] == max(got.values())


def test_oracle_sql_generator_agrees(spark):
    df = spark.createDataFrame(EDGES, "src bigint, dst bigint")
    got = {
        r.node: r.rank_scaled for r in pagerank(df, iterations=3).collect()
    }
    vals = ", ".join(f"({s}, {d})" for s, d in EDGES)
    block = oracle_pagerank_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", iterations=3
    )
    sql = f"WITH {block} SELECT node, r FROM pr_r3"
    want = dict(duckdb.sql(sql).fetchall())
    assert got == want

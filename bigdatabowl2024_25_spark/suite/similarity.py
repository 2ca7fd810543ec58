"""Parity queries: similarity search over `embeddings`
(array<float>, 64-dim).

q80 (brute-force top-k) and q81 (near-dup pairs) are oracle-verified
via the decimal-exact long-form dot product. q82 (LSH ANN) is the
scale path — deterministic but not SQL-oracle-expressible in one
readable statement; the driver records a rows-only check and
tests/test_similarity.py asserts its recall against q80.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.similarity import (
    ivf_index,
    ivf_topk,
    lsh_topk,
    pairwise_cosine,
    topk_per_query,
)
from ..sources.io import load_table
from .registry import query

_Q = "CAST(FLOOR(CAST({v} AS DOUBLE) * 1000000.0) AS BIGINT)"

_DOT = f"""
    SELECT q.vec_id AS q_id, d.vec_id AS d_id,
           CAST(CAST(SUM({_Q.format(v='q.embedding[i]')}
                         * {_Q.format(v='d.embedding[i]')}) AS BIGINT)
                AS DOUBLE) AS dot
    FROM embeddings q
    JOIN embeddings d ON {{pair_cond}}
    CROSS JOIN unnest(range(1, 65)) AS t(i)
    GROUP BY q.vec_id, d.vec_id
"""

_NORMS = f"""
    SELECT vec_id,
           SQRT(CAST(CAST(SUM({_Q.format(v='embedding[i]')}
                              * {_Q.format(v='embedding[i]')}) AS BIGINT)
                     AS DOUBLE)) AS nrm
    FROM embeddings CROSS JOIN unnest(range(1, 65)) AS t(i)
    GROUP BY vec_id
"""


@query(
    "q80_cosine_search",
    oracle=f"""
    WITH dots AS ({_DOT.format(pair_cond="q.vec_id < 8 AND d.vec_id <> q.vec_id")}),
    norms AS ({_NORMS}),
    scored AS (
        SELECT dots.q_id, dots.d_id,
               dots.dot / (qn.nrm * dn.nrm) AS cosine
        FROM dots
        JOIN norms qn ON qn.vec_id = dots.q_id
        JOIN norms dn ON dn.vec_id = dots.d_id
    ),
    alldots AS ({_DOT.format(pair_cond="q.vec_id < d.vec_id")})
    SELECT 'topk' AS kind, q_id, d_id, cosine, rank FROM (
        SELECT q_id, d_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cosine DESC, d_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 5
    UNION ALL
    SELECT 'neardup' AS kind, alldots.q_id, alldots.d_id,
           alldots.dot / (qn.nrm * dn.nrm) AS cosine,
           CAST(NULL AS BIGINT) AS rank
    FROM alldots
    JOIN norms qn ON qn.vec_id = alldots.q_id
    JOIN norms dn ON dn.vec_id = alldots.d_id
    WHERE alldots.dot / (qn.nrm * dn.nrm) >= 0.2
    """,
)
def q80_cosine_search(spark, sf_dir):
    """Exact cosine similarity search, both consumer shapes (round 3
    merge of two round-1 queries, COVERAGE.md): the 'topk' branch is
    brute-force cosine top-5 for 8 query vectors — the exact ANN
    baseline, O(n·q), broadcast query side; the 'neardup' branch is
    embedding-cosine near-dup detection — all pairs with cosine ≥ 0.2
    (the synthetic vectors are near-orthogonal; 0.2 captures the
    label-cluster structure without emitting the empty set). Dot
    products via posexplode + decimal sums: order-exact, so cosines
    match DuckDB bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    scored = pairwise_cosine(q, e, "vec_id", "embedding").filter(
        F.col("q_id") != F.col("d_id")
    )
    topk = topk_per_query(scored, k=5).select(
        F.lit("topk").alias("kind"), "q_id", "d_id", "cosine",
        F.col("rank").cast("bigint").alias("rank"),
    )
    pairs = pairwise_cosine(e, e, "vec_id", "embedding").filter(
        (F.col("q_id") < F.col("d_id")) & (F.col("cosine") >= 0.2)
    )
    neardup = pairs.select(
        F.lit("neardup").alias("kind"), "q_id", "d_id", "cosine",
        F.lit(None).cast("bigint").alias("rank"),
    )
    return topk.unionByName(neardup)


@query("q82_ann_lsh_topk")  # rows-only: engine-native ANN, no SQL oracle
def q82_ann_lsh_topk(spark, sf_dir):
    """Scale-path ANN: deterministic hyperplane-LSH buckets + exact
    rescoring within buckets. Recall vs q80 is asserted in
    tests/test_similarity.py (driver does a rows-only check here)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    out = lsh_topk(q, e, "vec_id", "embedding", k=5, planes=3, tables=4, dims=64)
    return out.filter(F.col("q_id") != F.col("d_id")).select(
        "q_id", "d_id", "cosine", "rank"
    )


@query("q83_ann_ivf_topk")  # rows-only: KMeans index, no SQL oracle
def q83_ann_ivf_topk(spark, sf_dir):
    """Scale-path ANN #2: IVF — KMeans coarse quantizer (seeded,
    deterministic), each query probes its 4 nearest of 16 inverted
    lists (~25% of the corpus scanned instead of 100%). Recall vs q80
    asserted in tests/test_similarity.py; driver does rows-only."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    assigned, centroids = ivf_index(e, "vec_id", "embedding", n_lists=16)
    out = ivf_topk(q, assigned, centroids, "vec_id", "embedding", k=5, nprobe=4)
    return out.filter(F.col("q_id") != F.col("d_id")).select(
        "q_id", "d_id", "cosine", "rank"
    )

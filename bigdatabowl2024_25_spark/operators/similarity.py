"""Similarity search over embedding columns (`array<float>`).

Two paths:
- `brute_force_topk`: exact cosine top-k. For oracle parity the dot
  products are computed via posexplode + join + decimal-stabilized
  sums (order-exact, engine-portable). For bench-speed there is also
  the array-native `cosine_col` (zip_with/aggregate — single-pass JVM,
  no explode) — same semantics, float-association-dependent low bits.
- `lsh_topk`: random-hyperplane LSH bucketing as the scale path —
  candidates share a bucket key; the expensive exact scoring runs only
  within buckets. Hyperplane signs are derived from the portable hash,
  so bucketing is deterministic across runs AND engines (no RNG).

Scale notes (100 TB / billions of vectors):
- the brute-force path is the correctness baseline and the per-bucket
  scorer; it is O(n·q) and must never run globally at scale.
- the LSH path shuffles each vector once per table (`planes` bits →
  one bucket key), then joins query buckets to data buckets — the
  classic ANN partition-prune; recall is tunable via planes/tables.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F



#: quantization scale: embedding floats become exact micro-integers via
#: floor(v*1e6). floor on an exact double product is bit-deterministic
#: in every engine (unlike double→decimal casts, whose rounding differs
#: between Spark and DuckDB in ~1e-3 of boundary cases), so all dot
#: products and norms below are pure int64 arithmetic — order-free and
#: engine-exact. The 1e-6 quantization error is ~1e-6 relative on
#: unit-scale vectors: irrelevant for similarity ranking.
QUANT = 1_000_000.0


def exploded(vecs: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    """(id, pos, micro-int val) long form of an embedding column."""
    return vecs.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.posexplode(vec_col).alias("pos", f"{prefix}_val"),
    ).withColumn(
        f"{prefix}_val",
        F.floor(F.col(f"{prefix}_val").cast("double") * QUANT).cast("bigint"),
    )


def norms(vecs: DataFrame, id_col: str, vec_col: str, out: str) -> DataFrame:
    """Integer-exact L2 norms of the quantized vectors: sqrt(Σ q²)."""
    ex = exploded(vecs, id_col, vec_col, "n")
    return ex.groupBy("n_id").agg(
        F.sqrt(F.sum(F.col("n_val") * F.col("n_val")).cast("double")).alias(out)
    ).withColumnRenamed("n_id", id_col)


def pairwise_cosine(
    queries: DataFrame,
    data: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact cosine for every (query, data) pair via the long-form join:
    dot = Σ q·d over micro-int values — int64, order-free. Returns
    (q_id, d_id, cosine)."""
    qe = exploded(queries, id_col, vec_col, "q")
    de = exploded(data, id_col, vec_col, "d")
    dots = (
        qe.join(de, ["pos"])
        .groupBy("q_id", "d_id")
        .agg(
            F.sum(F.col("q_val") * F.col("d_val")).cast("double").alias("dot")
        )
    )
    qn = norms(queries, id_col, vec_col, "q_norm").withColumnRenamed(
        id_col, "q_id"
    )
    dn = norms(data, id_col, vec_col, "d_norm").withColumnRenamed(
        id_col, "d_id"
    )
    return (
        dots.join(F.broadcast(qn), ["q_id"])
        .join(dn, ["d_id"])
        .select(
            "q_id",
            "d_id",
            (F.col("dot") / (F.col("q_norm") * F.col("d_norm"))).alias("cosine"),
        )
    )


def topk_per_query(pairs: DataFrame, k: int) -> DataFrame:
    """Deterministic per-query top-k: rank by (cosine desc, d_id)."""
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("d_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk(
    queries: DataFrame, data: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """Exact cosine top-k baseline (oracle-parity path)."""
    return topk_per_query(
        pairwise_cosine(queries, data, id_col, vec_col), k
    )


def cosine_col(a: Column, b: Column) -> Column:
    """Array-native single-pass cosine (bench path; float association
    order is Spark's own — do not oracle-compare)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def _plane_signs(plane: int, dims: int) -> list[float]:
    """h_plane[d] ∈ {−1, +1} from md5 of (plane, d) — computed driver-
    side with the same math as `portable_hash64`, so the planes are
    deterministic across runs/engines without RNG or a stored matrix."""
    import hashlib

    out = []
    for d in range(dims):
        h = int(hashlib.md5(f"plane:{plane}:{d}".encode()).hexdigest()[:15], 16)
        out.append(1.0 if h % 2 == 0 else -1.0)
    return out


def hyperplane_sign(vec_col: Column, plane: int, dims: int) -> Column:
    """Sign bit of <v, h_plane>. The plane is a literal array, the dot
    a single zip_with/aggregate — O(1) expression nodes instead of a
    64-term tree (keeps codegen small when planes × tables grows)."""
    h = F.array(*[F.lit(v) for v in _plane_signs(plane, dims)])
    dot = F.aggregate(
        F.zip_with(vec_col, h, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (dot > 0).cast("int")


def lsh_bucket(vec_col: Column, planes: int, dims: int, table: int = 0) -> Column:
    """Bucket key: concatenated sign bits of `planes` hyperplanes.
    `table` offsets the plane indices so each hash table draws an
    independent set of hyperplanes."""
    bits = [
        hyperplane_sign(vec_col, table * 1000 + p, dims) for p in range(planes)
    ]
    return F.concat_ws("", F.lit(str(table)), *[b.cast("string") for b in bits])


def lsh_topk(
    queries: DataFrame,
    data: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    planes: int = 3,
    tables: int = 4,
    dims: int = 64,
) -> DataFrame:
    """ANN: bucket both sides by hyperplane signs, score exactly within
    shared buckets only. `tables` independent hash tables
    OR-amplify recall (a pair is a candidate if it collides in ANY
    table); `planes` AND-amplifies precision (candidate volume shrinks
    ~2^planes per table). Recall vs the exact baseline is
    pytest-checked (tests/test_similarity.py)."""

    def banded(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        # one exploded bucket array, not a `tables`-way union — the
        # source subtree appears once in the plan
        buckets = F.array(
            *[
                lsh_bucket(F.col(vec_col), planes, dims, table=t)
                for t in range(tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(buckets).alias("bucket"),
            F.col(vec_col).alias(out_vec),
        )

    qe = banded(queries, "q_id", "q_vec")
    de = banded(data, "d_id", "d_vec")
    cand = (
        qe.join(de, ["bucket"])
        .select("q_id", "d_id", "q_vec", "d_vec")
        .dropDuplicates(["q_id", "d_id"])
    )
    pairs = cand.select(
        "q_id", "d_id", cosine_col(F.col("q_vec"), F.col("d_vec")).alias("cosine")
    )
    return topk_per_query(pairs, k)

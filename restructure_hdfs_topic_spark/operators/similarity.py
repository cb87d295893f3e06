"""Similarity search over embedding columns (north-star extension).

Two paths:
- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Embeddings are quantized to int64 (round(x * 10000)) before the dot
  product, so the arithmetic is EXACT integer math: any engine, any
  partitioning, any addition order produces identical results.  The final
  cosine is a single double division of exact integers → bit-stable.
- ``lsh_ann_topk``: the 100 TB path — deterministic random-hyperplane LSH
  bucketing; candidates are compared only within a bucket, turning the
  O(n²) cross join into a bucketed self-join.  Recall < 1 by construction
  (rows-only correctness check).

Scale notes: the query side is broadcast (small); the corpus never
collects to the driver; per-query top-k is a window over the candidate
set, which AQE keeps balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 10_000  # fixed-point scale for embedding quantization


def _quantize(col):
    """float array → int64 array, round-half-up at 1e-4 resolution."""
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT, 0).cast("long"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _norm2(a):
    return F.aggregate(a, F.lit(0).cast("long"), lambda acc, v: acc + v * v)


def cosine_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    ``queries`` defaults to the corpus itself (all-pairs search, excluding
    self).  Output: (query_id, rank, neighbor_id, cosine) — cosine rounded
    to 6 decimals, rank tie-broken by neighbor id.
    """
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _quantize(F.col(vec_col)).alias("c_vec")
    ).withColumn("c_norm2", _norm2(F.col("c_vec")))
    qs = (queries or embeddings).select(
        F.col(id_col).alias("query_id"), _quantize(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_norm2", _norm2(F.col("q_vec")))
    pairs = F.broadcast(qs).crossJoin(corpus).filter(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(
        _dot(F.col("q_vec"), F.col("c_vec")).cast("double")
        / (F.sqrt(F.col("q_norm2").cast("double")) * F.sqrt(F.col("c_norm2").cast("double"))),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def hyperplane_bucket(vec_col, planes: int = 8) -> F.Column:
    """Deterministic random-hyperplane signature: bit j = sign of the dot
    product with pseudo-plane_j, where plane_j[i] = ((2j+3)*(i+1)*2654435761
    mod 1009) - 504 — a fixed, engine-independent integer lattice."""
    def plane_term(j: int):
        return lambda x, i: x * (
            ((F.lit(2 * j + 3) * i * F.lit(2654435761)) % F.lit(1009)) - F.lit(504)
        )

    qv = _quantize(vec_col)
    bits = []
    for j in range(planes):
        plane_dot = F.aggregate(
            F.zip_with(qv, F.sequence(F.lit(1), F.size(qv)), plane_term(j)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(plane_dot >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket


def lsh_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 6,
) -> DataFrame:
    """Approximate top-k: compare only within a hyperplane-LSH bucket.

    At 100 TB: one shuffle on the bucket key; bucket sizes ~ n/2^planes,
    tunable; a multi-probe variant would union several plane sets.
    """
    tagged = embeddings.select(
        F.col(id_col).alias("id"),
        _quantize(F.col(vec_col)).alias("vec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    ).withColumn("norm2", _norm2(F.col("vec")))
    a = tagged.select(
        F.col("id").alias("query_id"), F.col("vec").alias("q_vec"),
        F.col("norm2").alias("q_norm2"), "bucket",
    )
    b = tagged.select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("c_vec"),
        F.col("norm2").alias("c_norm2"), "bucket",
    )
    pairs = a.join(b, ["bucket"]).filter(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(
        _dot(F.col("q_vec"), F.col("c_vec")).cast("double")
        / (F.sqrt(F.col("q_norm2").cast("double")) * F.sqrt(F.col("c_norm2").cast("double"))),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )

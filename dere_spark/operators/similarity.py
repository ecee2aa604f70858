"""Similarity search over embedding columns (array<float>).

Two paths, both pure DataFrame ops (no UDF — `F.zip_with`/`F.aggregate`
higher-order functions run inside codegen):

  * `cosine_topk` — brute-force exact top-k against a query vector; the
    baseline and the verifier for approximate methods. Scales linearly;
    the ranking is a global top-k (orderBy + limit -> Spark's
    TakeOrderedAndProject, no full sort).
  * `ivf_topk` — IVF-style approximate search: vectors are assigned to
    their nearest centroid bucket once (the expensive build), queries probe
    only their own bucket (nprobe=1). Centroids here are taken
    deterministically (first `n_centroids` vectors by id) so results are
    reproducible and oracle-checkable; a k-means build drops in without
    changing the search plan.

Arithmetic: element ops in array order, accumulated left-to-right in
doubles — deterministic, identical across engines and parallelism levels.
Rounding to 6 decimals at the boundary makes results hash-comparable.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a literal query."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        id_col,
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def assign_buckets(
    embeddings: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF build: nearest centroid per vector (broadcast centroid join).

    centroids: (centroid_id, centroid) — small, broadcast. Ties break to
    the lowest centroid_id, so assignment is total and deterministic.
    """
    c = centroids.select(
        F.col("centroid_id"), F.col("centroid")
    )
    joined = embeddings.join(F.broadcast(c))
    scored = joined.select(
        id_col,
        vec_col,
        "centroid_id",
        F.round(cosine(F.col(vec_col), F.col("centroid")), 6).alias("c_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("c_sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(id_col, vec_col, "centroid_id")
    )

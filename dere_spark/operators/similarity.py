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
    import math

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # The query norm is a literal: fold it on the driver instead of
    # re-running a 2x64-element HOF per row (r7, guide §1.2 "per-task
    # work"). Python's left-to-right double sum is the same IEEE fold
    # F.aggregate performs, so the value is bit-identical.
    qn = 0.0
    for x in query_vec:
        qn += float(x) * float(x)
    q_norm = F.lit(math.sqrt(qn))
    scored = embeddings.select(
        id_col,
        F.round(_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * q_norm), 6).alias(
            "cos_sim"
        ),
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
    scored = _score_centroids(embeddings, centroids, vec_col, id_col)
    # per-vector argmax as an AGGREGATE, not a window: groupBy+max_by gets
    # map-side partial aggregation, roughly halving shuffle bytes on the
    # hottest ANN path vs row_number-over-window (same answer — the
    # ordering struct makes the max unique: best c_sim, then lowest
    # centroid_id via the negated field).
    best = scored.groupBy(id_col).agg(
        F.max_by(
            F.struct(F.col(vec_col).alias("_v"), F.col("centroid_id").alias("_c")),
            F.struct(F.col("c_sim").alias("_s"), (-F.col("centroid_id")).alias("_nc")),
        ).alias("_best")
    )
    return best.select(
        id_col,
        F.col("_best._v").alias(vec_col),
        F.col("_best._c").alias("centroid_id"),
    )


def _score_centroids(
    embeddings: DataFrame,
    centroids: DataFrame,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    c = centroids.select("centroid_id", "centroid")
    return embeddings.join(F.broadcast(c)).select(
        id_col,
        vec_col,
        "centroid_id",
        F.round(cosine(F.col(vec_col), F.col("centroid")), 6).alias("c_sim"),
    )


def assign_buckets_topn(
    embeddings: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Multi-probe IVF build: each vector lands in its ``nprobe`` nearest
    centroid buckets (same deterministic ordering as assign_buckets), so
    near-dups straddling a single bucket boundary still share one."""
    from pyspark.sql import Window

    scored = _score_centroids(embeddings, centroids, vec_col, id_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("c_sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= nprobe)
        .select(id_col, vec_col, "centroid_id")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic Lloyd's k-means — the IVF centroid BUILD.

    * seeding: the k vectors with the smallest md5(id) (md5 is the
      engine's cross-engine deterministic "random", NOTES.md) — no RNG,
      so the build is reproducible and oracle-checkable;
    * assignment: cosine argmax via the broadcast-centroid join
      (assign_buckets — one pass, no shuffle of the vector table);
    * update: element-wise mean per bucket (posexplode -> partial+final
      avg), ROUNDED to 6 decimals so float-summation-order drift (across
      engines AND parallelism levels) cannot move a boundary vector
      between buckets; empty buckets keep their previous centroid;
    * each iteration is localCheckpoint-ed: plans stay flat for any
      iteration count, matching the checkpoint/lineage policy
      (plans/checkpoint.py) at web scale.

    Returns (centroid_id int, centroid array<double>).
    """
    from pyspark.sql import Window

    h = F.md5(F.col(id_col).cast("string"))
    w = Window.orderBy(h.asc(), F.col(id_col).asc())
    cents = (
        embeddings.select(id_col, vec_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).alias("centroid_id"),
            F.transform(F.col(vec_col), lambda x: F.round(x.cast("double"), 6)).alias(
                "centroid"
            ),
        )
    )
    for _ in range(iterations):
        assigned = assign_buckets(embeddings, cents, vec_col, id_col)
        means = (
            assigned.select(
                "centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("v"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: F.round(s["v"], 6),
                ).alias("new_centroid")
            )
        )
        cents = (
            cents.join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce("new_centroid", "centroid").alias("centroid"),
            )
            .localCheckpoint(eager=True)
        )
    return cents


def ivf_search_batch(
    embeddings: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Batched many-query IVF search — the scale path for ANN serving.

    Every query is routed to its ``nprobe`` nearest centroids (broadcast
    centroid join — queries never shuffle the vector table), then scored
    ONLY against the vectors of those buckets via an equi-join on
    centroid_id. Per-query top-k by a window (deterministic ties:
    cos desc, vec_id asc). Cost per query ~ nprobe/n_centroids of a full
    scan; the bucket join is a plain shuffle-hash join that scales with
    executors. Output: (query_id, vec_id, cos_sim, rank).
    """
    from pyspark.sql import Window

    assigned = assign_buckets(embeddings, centroids, vec_col, id_col)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("_qv"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("_q_sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q.join(F.broadcast(centroids))
        .select(
            "query_id",
            "_qv",
            "centroid_id",
            F.round(cosine(F.col("_qv"), F.col("centroid")), 6).alias("_q_sim"),
        )
        .withColumn("_prk", F.row_number().over(probe_w))
        .where(F.col("_prk") <= nprobe)
        .select("query_id", "_qv", "centroid_id")
    )
    cand = probes.join(assigned, "centroid_id").select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        F.round(cosine(F.col("_qv"), F.col(vec_col)), 6).alias("cos_sim"),
    )
    topk_w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(topk_w))
        .where(F.col("rank") <= k)
    )


def capped_ivf_buckets(
    embeddings: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    max_bucket: int = 1000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The IVF buckets `embedding_near_dup_pairs` will DROP at this cap:
    one row (centroid_id, bucket_size) per over-cap bucket (counting
    multi-probe assignments, exactly as the pairing does). The 'no
    silent caps' audit probe; empty means the cap bound nothing."""
    assigned = assign_buckets_topn(embeddings, centroids, nprobe, vec_col, id_col)
    return (
        assigned.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .where(F.col("bucket_size") > max_bucket)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 2,
    max_bucket: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate candidate pairs, IVF-blocked.

    The all-pairs O(n²) cosine comparison is pruned by the centroid
    buckets (the LSH-banding idea for dense vectors), with two guards the
    MinHash twin (dedup.candidate_pairs_lsh) already carries:

      * **multi-probe** (``nprobe`` nearest centroids per vector, default
        2): a near-dup pair straddling one bucket boundary still shares
        its second-nearest bucket, closing the classic IVF recall hole;
      * **bucket cap** (``max_bucket``): a degenerate bucket — exactly
        what near-duplicate-heavy corpora produce — would go quadratic in
        the self-join, so buckets over the cap are dropped. The drop is
        auditable via `capped_ivf_buckets(...)` with the same arguments,
        which reports each excluded bucket and its size.

    Output: (id_a, id_b, cos_sim) with id_a < id_b, cosine rounded to 6dp
    for cross-engine stability; pairs sharing several buckets emit once.
    """
    from pyspark.sql import Window

    assigned = assign_buckets_topn(embeddings, centroids, nprobe, vec_col, id_col)
    sized = assigned.withColumn(
        "_bucket_size", F.count(F.lit(1)).over(Window.partitionBy("centroid_id"))
    ).where(F.col("_bucket_size") <= max_bucket)
    a = sized.select(
        "centroid_id", F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = sized.select(
        "centroid_id", F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    return (
        a.join(b, "centroid_id")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .distinct()
    )

"""Triple materialization + entity linking.

Flattens assembled frames into (subj, pred, obj) triples — the north-rule
graph payload: a frame with anchor A and slot S filled by F becomes the
triple (entity(A), frame_type.S, entity(F)) with provenance (doc_id,
frame_id) and the scorer's confidence.

Entity linking is a broadcast-dictionary join: the high-frequency head of
the mention distribution resolves through a small broadcast dimension
(surface form -> canonical entity id); unresolved mentions fall back to a
deterministic surface-derived id. This generalizes the reference scorer's
``Equiv`` alias closure (dere/evaluation/deRE_evaluation.py:92-99) — full
MinHash-LSH + connected-components canonicalization for the tail lives in
operators/canonicalize.py.

Skew note: entity keys in web corpora are Zipfian; the link join keeps the
big side shuffle-free (broadcast), and downstream groupBys on entity ids
rely on AQE skew handling plus optional salting (operators/skew.py).
"""

from __future__ import annotations

from typing import Mapping, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def entity_dictionary(
    spark: SparkSession, aliases: Optional[Mapping[str, str]] = None
) -> DataFrame:
    """Tiny dimension (surface -> entity_id); broadcast at the link join."""
    rows = sorted((aliases or {}).items())
    return spark.createDataFrame(rows or [("", "")], "surface string, entity_id string").where(
        F.col("surface") != ""
    )


def link_entities(
    mentions: DataFrame,
    dictionary: DataFrame,
    surface_col: str,
    out_col: str,
) -> DataFrame:
    """Broadcast-dictionary entity link with deterministic fallback id.

    Fallback: ``ent:<lowercased surface>`` — stable, collision-free within
    the surface vocabulary, and computable without any shuffle.
    """
    d = dictionary.withColumnRenamed("surface", "__surface").withColumnRenamed(
        "entity_id", "__entity_id"
    )
    return (
        mentions.join(
            F.broadcast(d),
            F.lower(F.col(surface_col)) == F.col("__surface"),
            "left",
        )
        .withColumn(
            out_col,
            F.coalesce(
                F.col("__entity_id"), F.concat(F.lit("ent:"), F.lower(F.col(surface_col)))
            ),
        )
        .drop("__surface", "__entity_id")
    )


def frames_to_triples(frames: DataFrame, dictionary: DataFrame) -> DataFrame:
    """frames edge-list -> triples(subj, pred, obj, doc_id, frame_id, confidence)."""
    linked = link_entities(frames, dictionary, "anchor_text", "subj")
    linked = link_entities(linked, dictionary, "filler_text", "obj")
    return linked.select(
        "subj",
        F.col("predicate").alias("pred"),
        "obj",
        "doc_id",
        "frame_id",
        F.col("score").alias("confidence"),
    )


def write_triples(triples: DataFrame, path: str, partitions: int = 0) -> None:
    """Materialize the graph table, partitioned by predicate.

    On a cluster this is an Iceberg ``writeTo(...).partitionedBy("pred",
    bucket(N, "subj"))``; the sandbox writes partitioned parquet with the
    same layout so partition pruning on pred works identically.
    """
    out = triples
    if partitions:
        out = out.repartition(partitions, "pred", "subj")
    out.write.mode("overwrite").partitionBy("pred").parquet(path)

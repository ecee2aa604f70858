"""Candidate (anchor, filler) pair generation — the J1 self theta-join.

The reference enumerates ``product(instance.spans, instance.spans)`` and
keeps only pairs whose (anchor_type, filler_type) is plausible under the
schema (dere/models/_baseline/slot_classifier.py:347-383). Done naively at
web scale that is quadratic per page; we instead **band** the join:

  * each span gets a bucket ``floor(token_idx / k)`` (k = the distance
    bound). A filler within ±k tokens of an anchor is always in the
    anchor's bucket or an adjacent one, so the FILLER side is exploded to
    buckets {b-1, b, b+1} and the join equi-key is ``(doc_id, bucket)``
    with the anchor's own bucket. Each qualifying (anchor, filler) pair
    matches on exactly one bucket value — no dedup needed — and a document
    with n spans materializes O(n·k) rows inside the join instead of the
    O(n²) a doc_id-only equi-key would: the distance bound is IN the
    equi-key, not a post-join filter over a quadratic intermediate.
  * a giant page no longer lands in one hash-join cell: its spans spread
    over n/k buckets, so skew is structurally bounded (on top of AQE's
    runtime skew-split).
  * the compiled plausible-relations whitelist is pushed INTO the join as
    a broadcast dimension, so implausible pairs die before leaving the
    join (the reference's biggest pruner, kept as pushdown).
  * the anchor's ``bucket`` is kept as an output column: it is a pure
    function of ``anchor_idx``, so downstream windows keyed on
    (doc_id, anchor_idx, ...) can add it to their partitionBy and reuse
    the join's (doc_id, bucket) hash distribution with NO extra exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from dere_spark.plans.compiler import PlanSpec


def whitelist_df(spark: SparkSession, plan: PlanSpec) -> DataFrame:
    """Plausible-relations dimension:
    (anchor_type, filler_type, frame_type, slot_name, predicate)."""
    rows = []
    for (anchor_t, filler_t), labels in sorted(plan.plausible_relations.items()):
        for lab in labels:
            rows.append((anchor_t, filler_t, lab.frame_type, lab.slot_name, lab.predicate))
    return spark.createDataFrame(
        rows,
        "anchor_type string, filler_type string, frame_type string, "
        "slot_name string, predicate string",
    )


def candidate_pairs(
    spans: DataFrame,
    whitelist: DataFrame,
    max_token_distance: int = 3,
) -> DataFrame:
    """Banded self-join of spans per document, whitelist-pruned.

    Output: one row per plausible (anchor, filler, relation-label) triple
    within the distance window, with signed token distance
    (filler_idx - anchor_idx, never 0 — a span can't fill its own anchor)
    and the anchor's ``bucket`` (= floor(anchor_idx / k), for downstream
    exchange reuse; callers that expose pairs externally should drop it).
    """
    k = max(1, int(max_token_distance))
    a = spans.withColumn("bucket", F.floor(F.col("token_idx") / k)).alias("a")
    f = spans.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor(F.col("token_idx") / k) - 1,
                F.floor(F.col("token_idx") / k),
                F.floor(F.col("token_idx") / k) + 1,
            )
        ),
    ).alias("f")
    pairs = (
        # NO shuffle_hash hint here: a forced SHJ builds a per-partition
        # hash map of the whole filler partition, which OOMed the 6 GiB
        # scaling executors at 100x corpus (measured) — sort-merge spills
        # gracefully, and AQE converts to shuffled-hash at runtime when a
        # partition is actually small. Let the optimizer choose.
        a.join(
            f,
            (F.col("a.doc_id") == F.col("f.doc_id"))
            & (F.col("a.bucket") == F.col("f.bucket")),
            "inner",
        )
        .where(F.col("a.token_idx") != F.col("f.token_idx"))
        .where(
            F.abs(F.col("f.token_idx") - F.col("a.token_idx")) <= max_token_distance
        )
        .join(
            F.broadcast(whitelist),
            (F.col("a.span_type") == F.col("anchor_type"))
            & (F.col("f.span_type") == F.col("filler_type")),
            "inner",
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.bucket").alias("bucket"),
            F.col("a.token_idx").alias("anchor_idx"),
            F.col("a.span_type").alias("anchor_type"),
            F.col("a.left").alias("anchor_left"),
            F.col("a.right").alias("anchor_right"),
            F.col("a.text").alias("anchor_text"),
            F.col("f.token_idx").alias("filler_idx"),
            F.col("f.span_type").alias("filler_type"),
            F.col("f.left").alias("filler_left"),
            F.col("f.right").alias("filler_right"),
            F.col("f.text").alias("filler_text"),
            "frame_type",
            "slot_name",
            "predicate",
            (F.col("f.token_idx") - F.col("a.token_idx")).alias("token_distance"),
        )
    )
    return pairs

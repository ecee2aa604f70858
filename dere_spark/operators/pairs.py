"""Candidate (anchor, filler) pair generation — the J1 self theta-join.

The reference enumerates ``product(instance.spans, instance.spans)`` and
keeps only pairs whose (anchor_type, filler_type) is plausible under the
schema (dere/models/_baseline/slot_classifier.py:347-383). Done naively at
web scale that is quadratic per page; we instead:

  * equi-join on doc_id (instance locality makes this a hash join, NOT a
    cross join — Catalyst shuffles both sides once on doc_id);
  * push the compiled plausible-relations whitelist INTO the join as a
    broadcast dimension, so implausible pairs die before leaving the join
    (the reference's biggest pruner, kept as pushdown);
  * bound the pair window by token distance (``max_token_distance``), which
    turns the per-document blow-up from O(n²) to O(n·k) — the distance
    predicate is part of the join condition so AQE sees the true output
    size; skewed giant pages are additionally split by AQE skew-join.
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
    """Self-join spans with itself per document, whitelist-pruned.

    Output: one row per plausible (anchor, filler, relation-label) triple
    within the distance window, with signed token distance
    (filler_idx - anchor_idx, never 0 — a span can't fill its own anchor).
    """
    a = spans.alias("a")
    f = spans.alias("f")
    pairs = (
        a.join(f, F.col("a.doc_id") == F.col("f.doc_id"), "inner")
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

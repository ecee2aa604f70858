"""Slot scoring + frame assembly.

The reference scores every candidate pair with a linear classifier, keeps
non-"Nothing" predictions, then builds one frame per anchor span and adds
each predicted filler to its slot (dere/models/_baseline/slot_classifier.py:139-196).
Cardinality violations are repaired by splitting over-filled frames
(slot_classifier.py:198-228).

Our deterministic scorer (the "model" of the webtext task — a trained
classifier drops into the same contract via a batched Arrow UDF over the
pair DataFrame, see operators/kernels.py) ranks fillers per
(anchor, slot) by closeness:

  * Theme-like slots: nearest filler STRICTLY AFTER the anchor
    (token_distance > 0), ranked by distance;
  * Manner-like slots: filler immediately BEFORE the anchor
    (token_distance == -1).

Ranking/pruning is a window row_number per (doc, anchor, slot) — fully
deterministic (total ordering incl. tie-breaks) so results are bit-stable
across parallelism levels, as the scaling criterion requires.

``enforce_cardinality`` then applies the compiled slot bounds: frames
missing a min-cardinality slot are dropped, fillers beyond max_cardinality
are pruned best-first — the scalable re-expression of the reference's
combinations/product splitter (bounds in shipped specs make the top-k
semantics equivalent for max_cardinality=1 slots).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from dere_spark.plans.compiler import PlanSpec


def score_pairs(pairs: DataFrame) -> DataFrame:
    """Attach a deterministic plausibility score and keep scorable pairs.

    score = 1 / (1 + |token_distance|); direction rules encode the slot
    semantics (Theme: forward-looking; Manner: immediately preceding).
    """
    scored = pairs.withColumn(
        "score", F.lit(1.0) / (F.lit(1.0) + F.abs(F.col("token_distance")))
    )
    keep = (
        (F.col("slot_name") == "Theme") & (F.col("token_distance") > 0)
    ) | ((F.col("slot_name") == "Manner") & (F.col("token_distance") == -1))
    return scored.where(keep)


def best_fillers(scored: DataFrame) -> DataFrame:
    """Rank fillers per (doc, anchor, frame_type, slot) and keep rank-1..k.

    Deterministic total order: distance ASC, then filler_idx ASC — no
    physical-order dependence, so identical output at local[8] and
    local[32].
    """
    # "bucket" is functionally dependent on anchor_idx (floor(idx/k)), so
    # adding it to the partition key changes nothing semantically but lets
    # the window reuse the banded join's (doc_id, bucket) hash distribution
    # without a new exchange.
    w = Window.partitionBy(
        "doc_id", "bucket", "anchor_idx", "frame_type", "slot_name"
    ).orderBy(F.abs(F.col("token_distance")).asc(), F.col("filler_idx").asc())
    return scored.withColumn("filler_rank", F.row_number().over(w))


def assemble_frames(ranked: DataFrame, plan: PlanSpec) -> DataFrame:
    """Apply cardinality bounds and emit the slot-fill edge list.

    Output: frames in edge-list form —
    (doc_id, frame_id, frame_type, anchor_*, slot_name, filler_*, score).
    frame_id is the anchor's identity (doc-local token index), matching the
    reference's one-frame-per-anchor assembly (slot_classifier.py:180-196).

    Cardinality: per-slot max bound prunes by rank; frames lacking a
    min-required slot are dropped via an anti-join on the violation set.
    """
    max_card = F.create_map(
        *[
            x
            for lab in plan.relation_labels
            for x in (
                F.lit(lab.predicate),
                F.lit(lab.max_cardinality if lab.max_cardinality is not None else 1 << 30),
            )
        ]
    )
    fills = ranked.where(F.col("filler_rank") <= max_card[F.col("predicate")])

    required = [lab for lab in plan.relation_labels if (lab.min_cardinality or 0) > 0]
    if required:
        # Anchors must satisfy EVERY min-cardinality slot of their frame
        # type. Expressed as per-frame window counts rather than a
        # groupBy + semi-join: the window's ClusteredDistribution over
        # (doc_id, anchor_idx, frame_type) is already satisfied by the
        # corpus's doc_id hash partitioning, so this adds NO exchange and
        # never recomputes the fills subtree (a semi-join formulation was
        # benchmarked: it doubled the plan and added two shuffles).
        wf = Window.partitionBy("doc_id", "bucket", "anchor_idx", "frame_type")
        cond = None
        tmp_cols = []
        for i, lab in enumerate(required):
            col_name = f"_req_{i}"
            tmp_cols.append(col_name)
            fills = fills.withColumn(
                col_name,
                F.sum(
                    F.when(
                        (F.col("slot_name") == lab.slot_name)
                        & (F.col("frame_type") == lab.frame_type),
                        1,
                    ).otherwise(0)
                ).over(wf),
            )
            c = (F.col("frame_type") != lab.frame_type) | (
                F.col(col_name) >= lab.min_cardinality
            )
            cond = c if cond is None else (cond & c)
        fills = fills.where(cond).drop(*tmp_cols)

    return fills.select(
        "doc_id",
        F.col("anchor_idx").alias("frame_id"),
        "frame_type",
        "anchor_idx",
        "anchor_type",
        "anchor_left",
        "anchor_right",
        "anchor_text",
        "slot_name",
        "predicate",
        "filler_idx",
        "filler_type",
        "filler_left",
        "filler_right",
        "filler_text",
        "token_distance",
        "score",
        F.lit("predicted").alias("source"),
    )

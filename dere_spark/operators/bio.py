"""BIO sequence encoding/decoding as DataFrame plans.

The reference's span detector reduces span prediction to per-token BIO
tagging (encode: dere/models/_baseline/span_classifier.py:258-292 and
generic dere/models/_bio_span_model.py:87-106; decode: span_classifier.py:415-449
and _bio_span_model.py:118-141). Both directions are expressible with
window functions:

  * encode — a token is ``B`` if it begins a span of the target type, ``I``
    if it continues the SAME span (membership of the same span as the
    previous token — reproduced by comparing span start offsets), ``O``
    otherwise;
  * decode — classic sessionization: a running sum over "span-opening"
    flags assigns a group id to each in-span token; groups aggregate to
    (min left, max right). Non-strict mode (the generic BIOSpanModel
    behavior) opens a span at an orphan ``I``; strict mode treats orphan
    ``I`` as ``O``.

Scale: both are one window + one aggregation over (doc_id, token_idx) —
partitioning by doc_id is already satisfied corpus-wide, so no extra
exchange; decode's groupBy((doc, span_group)) clusters under the same key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def bio_encode(tokens: DataFrame, spans: DataFrame, span_type: str) -> DataFrame:
    """tokens(doc_id, token_idx, token, left, right) x spans -> + bio label.

    A token is inside a span when the span's [left, right) covers the
    token's interval (the reference's containment relaxations collapse to
    exact containment for offset-aligned tokenizers).
    """
    s = spans.where(F.col("span_type") == span_type).select(
        "doc_id",
        F.col("left").alias("s_left"),
        F.col("right").alias("s_right"),
    )
    j = tokens.join(
        s,
        (tokens["doc_id"] == s["doc_id"])
        & (F.col("left") >= F.col("s_left"))
        & (F.col("right") <= F.col("s_right")),
        "left",
    ).drop(s["doc_id"])
    # tie-break overlapping spans deterministically: keep the earliest
    w_tok = Window.partitionBy("doc_id", "token_idx").orderBy(
        F.col("s_left").asc_nulls_last(), F.col("s_right").asc_nulls_last()
    )
    j = j.withColumn("rk", F.row_number().over(w_tok)).where(F.col("rk") == 1).drop("rk")
    w = Window.partitionBy("doc_id").orderBy("token_idx")
    # the docstring's rule, literally: a covered token is I iff the
    # PREVIOUS token belongs to the SAME span (both bounds — two spans
    # can share a start), else it is the span's first covered token = B.
    # The reference labels the first aligned token B even when the span
    # starts mid-token (_bio_span_model.py:100-105); an exact
    # left==s_left test would mislabel that first token I, and strict
    # decode would then drop the span as an orphan-I run.
    same_as_prev = (F.lag("s_left").over(w) == F.col("s_left")) & (
        F.lag("s_right").over(w) == F.col("s_right")
    )
    label = (
        F.when(F.col("s_left").isNull(), "O")
        .when(same_as_prev, "I")
        .otherwise("B")
    )
    return j.withColumn("bio", label).select(
        "doc_id", "token_idx", "token", "left", "right", "bio"
    )


def bio_decode(
    labeled: DataFrame, span_type: str, strict: bool = False
) -> DataFrame:
    """labeled(doc_id, token_idx, left, right, bio) -> spans.

    Segment formulation (equivalent to the reference's stateful scan,
    span_classifier.py:415-449 / _bio_span_model.py:118-141, but
    window-expressible): every non-``I`` token opens a segment, so each
    segment is one leader token plus its trailing run of ``I``s. Then:

      * leader ``B``  -> span over the whole segment (both modes);
      * leader ``O``/sequence-start orphan ``I`` run -> strict: nothing;
        non-strict: span over the segment's ``I`` tokens only.
    """
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("token_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = labeled.withColumn(
        "_seg", F.sum(F.when(F.col("bio") != "I", 1).otherwise(0)).over(wrun)
    )
    agg = seg.groupBy("doc_id", "_seg").agg(
        F.min_by("bio", "token_idx").alias("leader_bio"),
        F.min("left").alias("seg_left"),
        F.max("right").alias("seg_right"),
        F.min(F.when(F.col("bio") == "I", F.col("left"))).alias("i_left"),
        F.max(F.when(F.col("bio") == "I", F.col("right"))).alias("i_right"),
        F.count(F.lit(1)).alias("n_seg_tokens"),
        F.sum(F.when(F.col("bio") == "I", 1).otherwise(0)).alias("n_i"),
    )
    b_spans = agg.where(F.col("leader_bio") == "B").select(
        "doc_id",
        F.col("seg_left").alias("left"),
        F.col("seg_right").alias("right"),
        F.col("n_seg_tokens").alias("n_tokens"),
    )
    if strict:
        spans = b_spans
    else:
        orphan = agg.where(
            (F.col("leader_bio") != "B") & (F.col("n_i") > 0)
        ).select(
            "doc_id",
            F.col("i_left").alias("left"),
            F.col("i_right").alias("right"),
            F.col("n_i").alias("n_tokens"),
        )
        spans = b_spans.unionByName(orphan)
    return spans.select(
        "doc_id",
        F.lit(span_type).alias("span_type"),
        F.col("left").cast("int"),
        F.col("right").cast("int"),
        F.col("n_tokens").cast("long"),
    )

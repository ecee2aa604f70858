"""Token ↔ span interval alignment with the reference's boundary
relaxations — J3/J4 (/root/reference/dere/models/_baseline/
span_classifier.py:228-256, slot_classifier.py:619-637).

A token t aligns to a span s when any of:
  1. containment: s.left <= t.left AND t.right <= s.right;
  2. overrun:    t.left == s.left AND t.right >  s.right  (token starts at
     the span start but the tokenizer ran past the span end — e.g. token
     'COX-2-mediated' vs span 'COX-2');
  3. underrun:   t.right == s.right AND t.left <  s.left  (token ends at
     the span end but started before it).

Expressed as a per-document range join; both sides are doc-partitioned so
the join is an equi-join on doc_id with the interval predicate applied
in-join (no cross join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def align_tokens_to_spans(tokens: DataFrame, spans: DataFrame) -> DataFrame:
    """tokens(doc_id, token_idx, left, right, ...) × spans(doc_id,
    span_type, left, right, ...) -> one row per aligned (token, span) with
    the match kind ('contained' | 'overrun' | 'underrun')."""
    s = spans.select(
        F.col("doc_id").alias("s_doc"),
        "span_type",
        F.col("left").alias("s_left"),
        F.col("right").alias("s_right"),
    )
    contained = (F.col("s_left") <= F.col("left")) & (F.col("right") <= F.col("s_right"))
    overrun = (F.col("left") == F.col("s_left")) & (F.col("right") > F.col("s_right"))
    underrun = (F.col("right") == F.col("s_right")) & (F.col("left") < F.col("s_left"))
    return (
        tokens.join(
            s,
            (tokens["doc_id"] == s["s_doc"]) & (contained | overrun | underrun),
            "inner",
        )
        .drop("s_doc")
        .withColumn(
            "match_kind",
            F.when(contained, "contained")
            .when(overrun, "overrun")
            .otherwise("underrun"),
        )
    )

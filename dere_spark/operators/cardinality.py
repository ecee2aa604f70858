"""The cardinality splitter — M6, `split_overfilled_frames`
(/root/reference/dere/models/_baseline/slot_classifier.py:198-228).

Reference semantics: a frame whose slot holds more fillers than the slot's
max_cardinality is replaced by MULTIPLE frames — one per element of the
cartesian product over per-slot `combinations(fillers, min(max_card, n))`;
assignments violating a min_cardinality are dropped. (Top-k pruning — what
the fast path in operators/frames.py does — keeps ONE best assignment; this
operator reproduces the reference's full split.)

Implementation: grouped Arrow kernel per frame (applyInPandas over the
frame key, so a frame's fills are never split across batches).
Combination blow-up is bounded: shipped specs cap max_cardinality at 1
except one unbounded slot, so variants are binomial coefficients of small
numbers; `max_combos` caps degenerate cases LOUDLY via the `truncated`
flag column — never silently.
"""

from __future__ import annotations

from itertools import combinations, product
from typing import Dict, List, Optional, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from dere_spark.plans.compiler import PlanSpec

_OUT_SCHEMA = (
    "doc_id string, frame_id long, variant int, frame_type string, "
    "slot_name string, filler_id long, truncated boolean"
)


def split_overfilled_frames(
    fills: DataFrame,
    plan: PlanSpec,
    max_combos: int = 64,
) -> DataFrame:
    """fills(doc_id, frame_id, frame_type, slot_name, filler_id) ->
    one row per (frame variant, slot, filler).

    Variants enumerate the cartesian product of per-slot filler
    combinations in deterministic order (fillers sorted by id; slots by
    name). `truncated` marks frames whose variant count hit `max_combos`.
    Frames that cannot satisfy a min_cardinality produce no rows (the
    reference drops those assignments, slot_classifier.py:220-227).
    """
    bounds: Dict[Tuple[str, str], Tuple[Optional[int], Optional[int]]] = {
        (lab.frame_type, lab.slot_name): (lab.min_cardinality, lab.max_cardinality)
        for lab in plan.relation_labels
    }
    for ft_name in plan.anchor_span_types:
        spec_ft = plan.task_spec.frame_type(ft_name)
        if spec_ft is not None and spec_ft.slot_types:
            bounds[(ft_name, spec_ft.anchor_slot.name)] = (1, 1)

    def split_one(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = pdf["doc_id"].iloc[0]
        frame_id = int(pdf["frame_id"].iloc[0])
        frame_type = pdf["frame_type"].iloc[0]
        slot_fillers = {
            slot: sorted(int(x) for x in g["filler_id"])
            for slot, g in pdf.groupby("slot_name", sort=True)
        }
        per_slot_choices: List[List[Tuple[str, Tuple[int, ...]]]] = []
        for slot in sorted(slot_fillers):
            fillers = slot_fillers[slot]
            min_c, max_c = bounds.get((frame_type, slot), (1, 1))
            take = len(fillers) if max_c is None else min(max_c, len(fillers))
            if min_c is not None and take < min_c:
                return pd.DataFrame(
                    [], columns=["doc_id", "frame_id", "variant", "frame_type",
                                 "slot_name", "filler_id", "truncated"]
                )
            per_slot_choices.append([(slot, c) for c in combinations(fillers, take)])

        rows: List[tuple] = []
        truncated = False
        for variant, assignment in enumerate(product(*per_slot_choices)):
            if variant >= max_combos:
                truncated = True
                break
            for slot, chosen in assignment:
                for filler in chosen:
                    rows.append(
                        (doc_id, frame_id, variant, frame_type, slot, filler)
                    )
        return pd.DataFrame(
            [r + (truncated,) for r in rows],
            columns=["doc_id", "frame_id", "variant", "frame_type",
                     "slot_name", "filler_id", "truncated"],
        )

    prepared = fills.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("frame_id").cast("long").alias("frame_id"),
        "frame_type",
        "slot_name",
        F.col("filler_id").cast("long").alias("filler_id"),
    )
    return prepared.groupBy("doc_id", "frame_id", "frame_type").applyInPandas(
        lambda pdf: split_one(pdf), _OUT_SCHEMA
    )

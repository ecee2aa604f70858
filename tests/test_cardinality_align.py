"""M6 cardinality splitter, J3 boundary-relaxed alignment, E5 soft-span
evaluation — reference-parity unit tests."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dere_spark.evaluation import span_eval_counts_soft
from dere_spark.operators.align import align_tokens_to_spans
from dere_spark.operators.cardinality import split_overfilled_frames
from dere_spark.plans.compiler import compile_plan
from dere_spark.taskspec import load_task_spec
from dere_spark.webtext import SPEC_PATH


@pytest.fixture(scope="module")
def plan():
    return compile_plan(load_task_spec(SPEC_PATH))


def _fills(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, frame_id long, frame_type string, slot_name string, filler_id long",
    )


def test_split_overfilled_theme(spark, plan):
    # Operation.Theme has max_cardinality 1; two Theme fillers -> 2 variants
    rows = [
        ("d", 1, "Operation", "Operation", 100),
        ("d", 1, "Operation", "Theme", 10),
        ("d", 1, "Operation", "Theme", 20),
    ]
    out = split_overfilled_frames(_fills(spark, rows), plan).collect()
    variants = {}
    for r in out:
        variants.setdefault(r["variant"], set()).add((r["slot_name"], r["filler_id"]))
    assert len(variants) == 2
    # each variant keeps the anchor and exactly one Theme (combinations order:
    # fillers sorted -> variant 0 takes 10, variant 1 takes 20)
    assert variants[0] == {("Operation", 100), ("Theme", 10)}
    assert variants[1] == {("Operation", 100), ("Theme", 20)}
    assert all(not r["truncated"] for r in out)


def test_split_respects_min_cardinality(spark, plan):
    # a frame with no Theme fill at all: Theme min_cardinality=1 is only
    # violated when the slot is PRESENT but short — absent slots pass
    # through (the reference iterates slots of the frame object; the
    # edge-list form only sees filled slots). Manner (min 0) optional.
    rows = [
        ("d", 2, "Operation", "Operation", 100),
        ("d", 2, "Operation", "Manner", 30),
    ]
    out = split_overfilled_frames(_fills(spark, rows), plan).collect()
    assert len(out) == 2  # single variant: anchor + manner


def test_split_unbounded_slot_keeps_all(spark):
    # Binding.Theme in the BioNLP spec has min 0, max unbounded ->
    # one variant containing every filler
    plan = compile_plan(load_task_spec("/root/reference/task-specs/bionlpst.xml"))
    rows = [
        ("d", 3, "Binding", "Binding", 100),
        ("d", 3, "Binding", "Theme", 1),
        ("d", 3, "Binding", "Theme", 2),
        ("d", 3, "Binding", "Theme", 3),
    ]
    out = split_overfilled_frames(_fills(spark, rows), plan).collect()
    assert {r["variant"] for r in out} == {0}
    themes = {r["filler_id"] for r in out if r["slot_name"] == "Theme"}
    assert themes == {1, 2, 3}


def test_align_relaxations(spark):
    tokens = spark.createDataFrame(
        [
            ("d", 0, 0, 5),    # exactly the span           -> contained
            ("d", 1, 10, 25),  # starts at span start, runs past -> overrun
            ("d", 2, 28, 40),  # ends at span end, starts before -> underrun
            ("d", 3, 50, 55),  # disjoint -> no match
        ],
        "doc_id string, token_idx int, left int, right int",
    )
    spans = spark.createDataFrame(
        [("d", "T", 0, 5), ("d", "T", 10, 15), ("d", "T", 30, 40)],
        "doc_id string, span_type string, left int, right int",
    )
    out = {r["token_idx"]: r["match_kind"] for r in align_tokens_to_spans(tokens, spans).collect()}
    assert out == {0: "contained", 1: "overrun", 2: "underrun"}


def test_soft_span_eval_modes(spark):
    gold = spark.createDataFrame(
        [("d", "T", 10, 20, "gold")],
        "doc_id string, span_type string, left int, right int, source string",
    )
    # off by 2 chars -> soft_boundary TP, exact would be FP
    hypo_close = spark.createDataFrame(
        [("d", "T", 12, 20, "predicted")],
        "doc_id string, span_type string, left int, right int, source string",
    )
    r = {x["type_name"]: (x["tp"], x["fp"], x["fn"])
         for x in span_eval_counts_soft(hypo_close, gold, mode="soft_boundary").collect()}
    assert r["T"] == (1, 0, 0)
    # barely overlapping -> soft_overlap TP, soft_boundary FP
    hypo_edge = spark.createDataFrame(
        [("d", "T", 19, 35, "predicted")],
        "doc_id string, span_type string, left int, right int, source string",
    )
    r2 = {x["type_name"]: (x["tp"], x["fp"], x["fn"])
          for x in span_eval_counts_soft(hypo_edge, gold, mode="soft_overlap").collect()}
    assert r2["T"] == (1, 0, 0)
    r3 = {x["type_name"]: (x["tp"], x["fp"], x["fn"])
          for x in span_eval_counts_soft(hypo_edge, gold, mode="soft_boundary").collect()}
    assert r3["T"] == (0, 1, 1)


def test_expand_span_bounds_reference_semantics():
    from dere_spark.evaluation import expand_span_bounds

    #       0123456789012345678901
    text = "the overexpression ok"
    # gold span 'express' [8,15) inside 'overexpression' [4,18):
    # left scan from 6 walks to the space at 3 -> 4; right from 17 walks to
    # the space at 18 -> 18
    assert expand_span_bounds(text, 8, 15) == (4, 18)
    # span at text start: clamps at 0
    assert expand_span_bounds("abcdef gh", 1, 3) == (0, 6)
    # the reference jumps 2 chars FIRST, skipping past nearer boundaries
    # (beg-2 lands on 'a' at 0, scans left, clamps; end+2 passes the space)
    assert expand_span_bounds("a bc d", 2, 4) == (0, 6)


def test_soft_word_eval(spark):
    from dere_spark.evaluation import span_eval_counts_soft_word

    instances = spark.createDataFrame(
        [("d", 0, "the overexpression ok")],
        "doc_id string, instance_idx int, text string",
    )
    gold = spark.createDataFrame(
        [("d", 0, "T", 8, 15, "gold")],
        "doc_id string, instance_idx int, span_type string, left int, right int, source string",
    )
    # hypo predicted the whole word 'overexpression' [4,18): exact match
    # fails, word-boundary soft match succeeds
    hypo = spark.createDataFrame(
        [("d", 0, "T", 4, 18, "predicted")],
        "doc_id string, instance_idx int, span_type string, left int, right int, source string",
    )
    r = {x["type_name"]: (x["tp"], x["fp"], x["fn"])
         for x in span_eval_counts_soft_word(hypo, gold, instances).collect()}
    assert r["T"] == (1, 0, 0)

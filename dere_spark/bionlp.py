"""BioNLP'09 slot filling with the generic engine — the reference's own
task (task-specs/bionlpst.xml, tutorial/data) run through the exact same
staged primitives as the webtext pipeline, proving the engine is
schema-driven rather than corpus-specific:

  BRAT load (given Protein spans + text)
  -> offset tokenizer over instances
  -> trigger detection: gazetteer induced from TRAIN gold trigger spans
     (the S8 gazetteer path; the reference ships a hand-built gazetteer,
     model-specs/training_gazetteer_bionlp, and its CRF uses gazetteer
     membership as a core feature, span_classifier.py:294-322)
  -> candidate pairs: compiled plausible-pair whitelist from the schema
     (anchor trigger × given Protein)
  -> deterministic nearest-Theme scoring + cardinality enforcement
  -> frames, evaluated against gold with the reference's matching
     semantics (evaluation.py analog)

The learned CRF/SVC would slot into the detect/score stages as Arrow
kernels (operators/kernels.py) without touching the plan around them; the
deterministic rules here establish the end-to-end plumbing and an honest
heuristic baseline score.
"""

from __future__ import annotations

from typing import Dict, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from dere_spark.evaluation import EvalResult, evaluate
from dere_spark.operators.tokenize import tokenize
from dere_spark.plans.compiler import compile_plan
from dere_spark.sources.brat import load_brat
from dere_spark.taskspec import TaskSpecification, load_task_spec

BIONLP_SPEC = "/root/reference/task-specs/bionlpst.xml"


def induce_trigger_gazetteer(train: Dict[str, DataFrame]) -> DataFrame:
    """Gazetteer from train gold trigger spans: lowercased surface ->
    majority span type (ties: lexicographically first — deterministic).

    Mirrors what the reference's gazetteer file encodes; induced from data
    instead of shipped. Protein is 'given' (predict=False), never induced.
    """
    gold_triggers = train["spans"].where(F.col("source") == "gold")
    counted = (
        gold_triggers.groupBy(F.lower(F.col("text")).alias("term"), "span_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("term").orderBy(F.col("n").desc(), F.col("span_type").asc())
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("term", "span_type")
    )


def detect_triggers(corpus: Dict[str, DataFrame], gazetteer: DataFrame) -> DataFrame:
    """Token-level trigger detection over BRAT instances.

    Returns spans in the corpus's span shape: (doc_id, instance_idx,
    span_type, left, right, text, source='predicted').
    """
    inst = corpus["instances"].select(
        F.concat_ws("#", "doc_id", "instance_idx").alias("doc_id"),
        F.col("text"),
    )
    toks = tokenize(inst)
    hits = toks.join(
        F.broadcast(gazetteer), F.lower(toks["token"]) == gazetteer["term"], "inner"
    )
    return hits.select(
        F.split_part("doc_id", F.lit("#"), F.lit(1)).alias("doc_id"),
        F.split_part("doc_id", F.lit("#"), F.lit(2)).cast("int").alias("instance_idx"),
        "span_type",
        "left",
        "right",
        F.col("token").alias("text"),
        F.lit("predicted").alias("source"),
    )


def extract_frames(
    spark: SparkSession,
    corpus: Dict[str, DataFrame],
    triggers: DataFrame,
    spec: TaskSpecification,
    max_char_distance: int = 120,
) -> Tuple[DataFrame, DataFrame]:
    """Candidate pairs + nearest-Theme rule -> (frames, slot_fills) in the
    corpus's BRAT shape, ready for dump/evaluate.

    Whitelist is compiled from the schema (anchor trigger type × filler
    span types of each slot); the scorer is nearest-in-characters with a
    window bound — the structural twin of webtext's nearest-token rule.
    """
    plan = compile_plan(spec)
    wl_rows = [
        (a, f_, lab.frame_type, lab.slot_name)
        for (a, f_), labs in sorted(plan.plausible_relations.items())
        for lab in labs
    ]
    wl = spark.createDataFrame(
        wl_rows, "anchor_type string, filler_type string, frame_type string, slot_name string"
    )

    given = corpus["spans"].where(F.col("source") == "given").select(
        "doc_id", "instance_idx",
        F.col("span_type").alias("filler_type"),
        F.col("left").alias("f_left"),
        F.col("right").alias("f_right"),
        F.col("tag").alias("filler_tag"),
    )
    anchors = triggers.select(
        "doc_id", "instance_idx",
        F.col("span_type").alias("anchor_type"),
        F.col("left").alias("a_left"),
        F.col("right").alias("a_right"),
        F.col("text").alias("anchor_text"),
    )
    pairs = (
        anchors.join(given, ["doc_id", "instance_idx"], "inner")
        .join(F.broadcast(wl), ["anchor_type", "filler_type"], "inner")
        .withColumn(
            "char_distance",
            F.when(F.col("f_left") >= F.col("a_right"), F.col("f_left") - F.col("a_right"))
            .otherwise(F.col("a_left") - F.col("f_right")),
        )
        .where(F.col("char_distance") <= max_char_distance)
    )
    w = Window.partitionBy(
        "doc_id", "instance_idx", "a_left", "a_right", "frame_type", "slot_name"
    ).orderBy(F.col("char_distance").asc(), F.col("f_left").asc())
    best = pairs.withColumn("rk", F.row_number().over(w)).where(
        (F.col("rk") == 1) & (F.col("slot_name") == "Theme")
    )

    frames = best.select(
        "doc_id",
        F.concat_ws(":", F.lit("P"), "instance_idx", "a_left", "a_right", "frame_type").alias("tag"),
        "frame_type",
        F.lit("predicted").alias("source"),
        F.lit(0).alias("line_no"),
        F.lit(None).cast("int").alias("file_index"),
        "instance_idx",
    ).distinct()

    # slot fills: anchor slot (trigger span, identified by a synthetic tag
    # resolved through the predicted-trigger table) + Theme (given span tag)
    anchor_fills = best.select(
        "frame_type",
        F.col("frame_type").alias("slot_name"),  # anchor slot named like the frame type
        "doc_id",
        F.lit("predicted").alias("source"),
        F.concat_ws(":", F.lit("P"), "instance_idx", "a_left", "a_right", "frame_type").alias("frame_tag"),
        F.lit(0).alias("fill_idx"),
        F.concat_ws(":", F.lit("PT"), "instance_idx", "a_left", "a_right").alias("filler_tag"),
        F.lit("span").alias("filler_kind"),
    )
    theme_fills = best.select(
        "frame_type",
        "slot_name",
        "doc_id",
        F.lit("predicted").alias("source"),
        F.concat_ws(":", F.lit("P"), "instance_idx", "a_left", "a_right", "frame_type").alias("frame_tag"),
        F.lit(1).alias("fill_idx"),
        "filler_tag",
        F.lit("span").alias("filler_kind"),
    )
    fills = anchor_fills.unionByName(theme_fills)
    return frames, fills


def predicted_corpus(
    spark: SparkSession, corpus: Dict[str, DataFrame], spec: TaskSpecification,
    gazetteer: DataFrame,
) -> Dict[str, DataFrame]:
    """Full predict path: given spans kept, gold stripped, triggers +
    frames predicted — the Model.evaluate contract (clone -> strip_gold ->
    predict, dere/models/_model.py:56-60)."""
    triggers = detect_triggers(corpus, gazetteer)
    trigger_spans = triggers.select(
        "doc_id", "instance_idx",
        F.concat_ws(":", F.lit("PT"), "instance_idx", "left", "right").alias("tag"),
        "span_type", "left", "right",
        F.col("text").alias("span_text"), F.col("text").alias("text"),
        "source",
        F.lit(None).cast("int").alias("file_index"),
        F.lit(0).alias("line_no"),
    )
    frames, fills = extract_frames(spark, corpus, triggers, spec)
    given_spans = corpus["spans"].where(F.col("source") == "given")
    return {
        "instances": corpus["instances"],
        "spans": given_spans.unionByName(trigger_spans),
        "frames": frames,
        "slot_fills": fills,
    }


def run_bionlp_eval(
    spark: SparkSession, train_dir: str, eval_dir: str
) -> EvalResult:
    """Induce gazetteer on train, predict on eval, score vs gold."""
    spec = load_task_spec(BIONLP_SPEC)
    train = load_brat(spark, train_dir, spec)
    gaz = induce_trigger_gazetteer(train)
    gold = load_brat(spark, eval_dir, spec)
    hypo = predicted_corpus(spark, gold, spec, gaz)
    return evaluate(hypo, gold)

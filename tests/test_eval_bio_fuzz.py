"""Randomized structure fuzz for the two trickiest relational kernels.

1. Frame CC-isomorphism evaluation (E2): on ARBITRARY random frame
   graphs (nesting, multi-fill slots, frame->frame chains, shared
   fillers), gold-vs-gold must be a perfect match (fp == fn == 0) —
   isomorphism + greedy consume can never lose a component against an
   identical side — and deleting one frame must strictly reduce tp.
2. BIO encode/decode (W2/W3): for random token-aligned disjoint spans,
   encode -> strict decode is the identity; for arbitrary random label
   sequences, non-strict decode never crashes and decode∘encode is
   idempotent on its own output.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# random frame corpora
# ---------------------------------------------------------------------------

def _random_corpus(spark, seed: int):
    rng = random.Random(seed)
    span_rows, frame_rows, fill_rows = [], [], []
    for d in range(6):
        doc = f"doc{d}"
        n_spans = rng.randrange(2, 8)
        for i in range(n_spans):
            left = i * 10
            span_rows.append(
                (doc, f"T{i+1}", rng.choice(["Protein", "Entity"]), left, left + 4)
            )
        n_frames = rng.randrange(1, 6)
        for j in range(n_frames):
            ftag = f"E{j+1}"
            ftype = rng.choice(["Binding", "Gene_expression", "Regulation"])
            frame_rows.append((doc, ftag, ftype, "gold", j))
            # anchor fill: a span
            fill_rows.append(
                (doc, ftag, ftype, 0, f"T{rng.randrange(1, n_spans + 1)}", "span")
            )
            # random extra fills: spans and (possibly forward) frames
            for k in range(rng.randrange(0, 3)):
                if rng.random() < 0.5 and n_frames > 1:
                    other = f"E{rng.randrange(1, n_frames + 1)}"
                    if other != ftag:
                        fill_rows.append((doc, ftag, "Theme", k + 1, other, "frame"))
                else:
                    fill_rows.append(
                        (doc, ftag, "Theme", k + 1,
                         f"T{rng.randrange(1, n_spans + 1)}", "span")
                    )
    return {
        "spans": spark.createDataFrame(
            span_rows, "doc_id string, tag string, span_type string, left int, right int"
        ),
        "frames": spark.createDataFrame(
            frame_rows,
            "doc_id string, tag string, frame_type string, source string, line_no int",
        ),
        "slot_fills": spark.createDataFrame(
            fill_rows,
            "doc_id string, frame_tag string, slot_name string, fill_idx int, "
            "filler_tag string, filler_kind string",
        ),
    }


@pytest.mark.parametrize("seed", [11, 42, 77])
def test_frame_eval_identity_on_random_structures(spark, seed):
    from dere_spark.evaluation import frame_eval_counts

    corpus = _random_corpus(spark, seed)
    counts = frame_eval_counts(corpus, corpus).collect()
    assert counts, "no frame rows produced"
    total_tp = 0
    for r in counts:
        assert r["fp"] == 0 and r["fn"] == 0, f"identity mismatch: {r}"
        total_tp += r["tp"]
    assert total_tp > 0

    # deleting one frame strictly reduces tp and creates fn
    victim = corpus["frames"].orderBy("doc_id", "tag").first()
    hypo = {
        "spans": corpus["spans"],
        "frames": corpus["frames"].where(
            ~((F.col("doc_id") == victim["doc_id"]) & (F.col("tag") == victim["tag"]))
        ),
        "slot_fills": corpus["slot_fills"].where(
            ~((F.col("doc_id") == victim["doc_id"])
              & (F.col("frame_tag") == victim["tag"]))
        ),
    }
    perturbed = frame_eval_counts(hypo, corpus).collect()
    assert sum(r["tp"] for r in perturbed) < total_tp
    assert sum(r["fn"] for r in perturbed) > 0


# ---------------------------------------------------------------------------
# BIO round trips
# ---------------------------------------------------------------------------

def _token_frame(spark, n_docs: int, n_tokens: int):
    rows = [
        (f"d{d}", i, f"t{i}", i * 5, i * 5 + 4)
        for d in range(n_docs)
        for i in range(n_tokens)
    ]
    return spark.createDataFrame(
        rows, "doc_id string, token_idx int, token string, left int, right int"
    )


@pytest.mark.parametrize("seed", [5, 19])
def test_bio_encode_strict_decode_identity(spark, seed):
    from dere_spark.operators.bio import bio_decode, bio_encode

    rng = random.Random(seed)
    n_tokens = 24
    tokens = _token_frame(spark, 4, n_tokens)
    span_rows = []
    for d in range(4):
        i = 0
        while i < n_tokens - 1:
            if rng.random() < 0.3:
                width = rng.randrange(1, 4)
                j = min(i + width, n_tokens)
                span_rows.append((f"d{d}", "X", i * 5, (j - 1) * 5 + 4))
                i = j  # disjoint, possibly adjacent
            else:
                i += 1
    spans = spark.createDataFrame(
        span_rows, "doc_id string, span_type string, left int, right int"
    )
    decoded = bio_decode(bio_encode(tokens, spans, "X"), "X", strict=True)
    got = {(r["doc_id"], r["left"], r["right"]) for r in decoded.collect()}
    want = {(d, l, r) for d, _, l, r in span_rows}
    assert got == want


@pytest.mark.parametrize("seed", [23])
def test_bio_decode_arbitrary_labels_idempotent(spark, seed):
    from dere_spark.operators.bio import bio_decode, bio_encode

    rng = random.Random(seed)
    n_tokens = 30
    rows = [
        (f"d{d}", i, f"t{i}", i * 5, i * 5 + 4, rng.choice(["B", "I", "O"]))
        for d in range(6)
        for i in range(n_tokens)
    ]
    labeled = spark.createDataFrame(
        rows,
        "doc_id string, token_idx int, token string, left int, right int, bio string",
    )
    tokens = labeled.drop("bio")
    first = bio_decode(labeled, "X")  # non-strict: orphan-I runs become spans
    spans1 = {(r["doc_id"], r["left"], r["right"]) for r in first.collect()}
    assert spans1  # random labels essentially always produce some span
    spans_df = first.select(
        "doc_id", F.lit("X").alias("span_type"), "left", "right"
    )
    second = bio_decode(bio_encode(tokens, spans_df, "X"), "X", strict=True)
    spans2 = {(r["doc_id"], r["left"], r["right"]) for r in second.collect()}
    assert spans2 == spans1, (
        f"decode∘encode not idempotent: only-in-1 {spans1 - spans2}, "
        f"only-in-2 {spans2 - spans1}"
    )

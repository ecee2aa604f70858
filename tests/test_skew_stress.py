"""Skew stress gate for the banded candidate join (VERDICT r3 next-step #5,
SURVEY §7.4 #5): a single giant document — every token a gazetteer span —
must NOT quadratically blow up inside the J1 self-join. The band bucket is
already plan-enforced (test_plan_shape.py); this proves the RUNTIME bound:
rows per (doc_id, bucket) join cell stay at the closed-form O(k) ceiling
and total pairs stay O(n·k), on an input ~1000x more span-dense per doc
than the benchmark corpus.
"""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F
import pytest


N_TOKENS = 30_000  # one page, ten-thousands of spans (SURVEY's "giant doc")


@pytest.fixture(scope="module")
def giant_corpus_dir(spark, tmp_path_factory):
    """A corpus of one giant doc + one normal doc, written in the driver
    testdata shape (doc_id bigint, text, lang, source, n_chars)."""
    from dere_spark.webtext import GAZETTEERS

    # cycle through gazetteer terms so EVERY token is a span candidate and
    # every adjacent pair hits the whitelist in some direction
    terms = list(itertools.chain.from_iterable(GAZETTEERS.values()))
    tokens = [terms[i % len(terms)] for i in range(N_TOKENS)]
    giant = " ".join(tokens)
    out = str(tmp_path_factory.mktemp("skew") / "corpus")
    spark.createDataFrame(
        [
            (0, giant, "en", "synthetic", len(giant)),
            (1, "join table fast", "en", "synthetic", 15),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(out + "/documents.parquet")
    return out


def test_giant_doc_pairs_bounded(spark, giant_corpus_dir):
    """Per-bucket join output is bounded by the closed form
    anchors_per_bucket(k) x fillers_in_window(2k) x max_labels — NOT by
    the document's span count. Total pairs stay O(n*k)."""
    from dere_spark.webtext import MAX_TOKEN_DISTANCE, build_stages

    k = MAX_TOKEN_DISTANCE
    stages = build_stages(spark, giant_corpus_dir)
    n_spans = stages["spans"].count()
    assert n_spans >= N_TOKENS  # every token matched (some tokens 2 types)

    pairs = stages["pairs"]
    # max relation labels for one (anchor_type, filler_type) cell
    from dere_spark.operators.pairs import whitelist_df
    from dere_spark.webtext import webtext_plan

    wl = whitelist_df(spark, webtext_plan())
    max_labels = (
        wl.groupBy("anchor_type", "filler_type").count().agg(F.max("count")).first()[0]
    )
    span_types_per_token = max(
        stages["spans"].groupBy("doc_id", "token_idx").count().agg(F.max("count")).first()[0],
        1,
    )

    per_bucket = (
        pairs.groupBy("doc_id", "bucket").count().agg(F.max("count").alias("mx")).first()
    )
    # closed form: <= k anchor tokens per bucket, each pairing with <= 2k
    # filler tokens in the +-k window, x type multiplicity on both sides,
    # x label multiplicity
    ceiling = k * (2 * k) * (span_types_per_token ** 2) * max_labels
    assert per_bucket["mx"] <= ceiling, (
        f"join cell blew past the structural bound: {per_bucket['mx']} > {ceiling}"
    )

    total = pairs.count()
    linear_bound = n_spans * (2 * k) * span_types_per_token * max_labels
    quadratic = n_spans * n_spans
    assert total <= linear_bound, f"pairs {total} exceed O(n*k) bound {linear_bound}"
    assert total < quadratic / 100, "pair count is tracking O(n^2)"


def test_giant_doc_flagship_completes(spark, giant_corpus_dir):
    """The full documents->triples pipeline survives the giant page and
    produces linked triples from it (no OOM, no task retry storm)."""
    from dere_spark.webtext import build_stages

    triples = build_stages(spark, giant_corpus_dir)["triples"]
    n = triples.count()
    assert n > 0
    # the giant doc itself must contribute
    assert triples.where(F.col("doc_id") == "0").count() > 0

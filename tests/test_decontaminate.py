"""Benchmark decontamination (operators/decontaminate.py): n-gram set
construction, overlap flagging, the anti-join cut, and edge cases."""

from __future__ import annotations

import pytest

from dere_spark.operators.decontaminate import (
    contamination_hits,
    decontaminate,
    ngram_set,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_ngram_set_exact_and_short_docs_empty(spark):
    docs = _df(spark, [("d1", "The cat sat on the mat"), ("d2", "too short")])
    got = {(r.doc_id, r.gram) for r in ngram_set(docs, n=3).collect()}
    assert got == {
        ("d1", "the cat sat"),
        ("d1", "cat sat on"),
        ("d1", "sat on the"),
        ("d1", "on the mat"),
    }


def test_duplicate_grams_counted_once(spark):
    docs = _df(spark, [("d", "a b a b a b")])
    grams = ngram_set(docs, n=2).collect()
    assert {r.gram for r in grams} == {"a b", "b a"}
    assert len(grams) == 2


def test_contamination_flags_verbatim_and_normalized_inclusion(spark):
    bench = _df(spark, [("q1", "What is the capital of France?")])
    docs = _df(
        spark,
        [
            # verbatim benchmark sentence buried in a longer page,
            # different case/punctuation (normalization must not hide it)
            ("bad", "trivia page: WHAT IS THE CAPITAL OF FRANCE, you ask"),
            ("ok", "an unrelated page about cooking pasta at home"),
        ],
    )
    hits = {r.doc_id: r.n_shared for r in
            contamination_hits(docs, bench, n=5).collect()}
    assert "bad" in hits and hits["bad"] >= 1
    assert "ok" not in hits
    kept = decontaminate(docs, bench, n=5)
    assert [r.doc_id for r in kept.select("doc_id").collect()] == ["ok"]


def test_n_shared_counts_distinct_shared_grams(spark):
    bench = _df(spark, [("b", "one two three four")])
    docs = _df(spark, [("d", "zzz one two three four yyy")])
    hits = contamination_hits(docs, bench, n=2).collect()
    # shared 2-grams: "one two", "two three", "three four"
    assert hits[0].n_shared == 3


def test_benchmark_shorter_than_n_flags_nothing(spark):
    bench = _df(spark, [("b", "tiny")])
    docs = _df(spark, [("d", "tiny words everywhere in this page")])
    assert contamination_hits(docs, bench, n=8).count() == 0
    assert decontaminate(docs, bench, n=8).count() == 1


def test_parameter_validation(spark):
    docs = _df(spark, [("d", "a b c")])
    with pytest.raises(ValueError):
        ngram_set(docs, n=0)

"""Gopher repetition filters (operators/gopher_quality.py): exact stats
vs a Python reference, rule behavior, edge cases, plan shape."""

from __future__ import annotations

import re
from collections import Counter

from dere_spark.operators.gopher_quality import gopher_filter, repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _py_stats(text):
    t = [x for x in re.split(r"[^a-z0-9]+", (text or "").lower()) if x]
    grams = [f"{a} {b}" for a, b in zip(t, t[1:])]
    return (
        len(t),
        len(set(t)),
        sum(len(x) for x in t),
        max(Counter(t).values()) if t else 0,
        len(grams),
        max(Counter(grams).values()) if grams else 0,
    )


def test_stats_match_python_reference(spark):
    rows = [
        ("a", "the cat sat on the mat and the cat ran"),
        ("b", "word word word word"),
        ("c", "x"),
        ("d", ""),
        ("e", None),
        ("f", "ab cd ab cd ab cd ab"),
    ]
    got = {
        r.doc_id: (
            r.n_words, r.n_distinct, r.word_chars,
            r.top_word_n, r.n_2grams, r.top_2gram_n,
        )
        for r in repetition_stats(_docs(spark, rows)).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_stats(text), doc_id


def test_filter_drops_repetitive_and_short(spark):
    # 60 distinct medium-length words: passes every default rule ("the
    # quick brown fox..." x8 would FAIL the 0.2 top-word rule — 'the' is
    # 16/72 - which is itself a good sanity check of the defaults)
    good = " ".join(f"topic{i} detail{i}" for i in range(30))
    rows = [
        ("good", good),
        ("short", "just five small words here"),
        ("oneword", "spam " * 80),
        ("pairspam", "buy now " * 40),
    ]
    kept = gopher_filter(_docs(spark, rows), min_words=50)
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {"good"}


def test_filter_thresholds_are_parameters(spark):
    rows = [("tiny", "seven words is just not enough here")]
    assert gopher_filter(_docs(spark, rows), min_words=50).count() == 0
    assert gopher_filter(_docs(spark, rows), min_words=5).count() == 1


def test_map_side_only_no_exchange(spark):
    docs = _docs(spark, [("d", "a b c")])
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # the composite cut is a Filter-over-Project, not a join: still no
    # shuffle and only one scan of the corpus
    fplan = gopher_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in fplan and "Join" not in fplan


def test_filter_rejects_stat_name_clash(spark):
    import pytest
    docs = spark.createDataFrame(
        [("d", "a b c", 1)], "doc_id string, text string, n_words int"
    )
    with pytest.raises(ValueError):
        gopher_filter(docs)

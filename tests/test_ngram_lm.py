"""Bigram LM quality scoring (operators/ngram_lm.py): exact counts,
reference-parity perplexity, quality-filter behavior, determinism."""

from __future__ import annotations

import math

import pytest
import pyspark.sql.functions as F

from dere_spark.operators.ngram_lm import (
    BOS,
    EOS,
    doc_bigrams,
    filter_by_perplexity,
    fit_bigram_lm,
    perplexity,
)

CORPUS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the cat ran"),
    ("d3", "a dog sat"),
]


def _docs(spark, rows=CORPUS):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _py_tokens(s):
    import re

    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _py_pairs(s):
    t = [BOS] + _py_tokens(s) + [EOS]
    return list(zip(t[:-1], t[1:]))


def _py_fit(rows):
    big, uni = {}, {}
    for _, s in rows:
        for w1, w2 in _py_pairs(s):
            big[(w1, w2)] = big.get((w1, w2), 0) + 1
            uni[w1] = uni.get(w1, 0) + 1
    vocab = {w2 for _, w2 in big}
    return big, uni, len(vocab)


def _py_ppl(s, big, uni, v, k=1.0):
    pairs = _py_pairs(s)
    h = -sum(
        math.log2((big.get(p, 0) + k) / (uni.get(p[0], 0) + k * v)) for p in pairs
    ) / len(pairs)
    return 2.0**h


def test_bigram_counts_exact(spark):
    bigrams, unigrams, v = fit_bigram_lm(_docs(spark))
    got = {(r.w1, r.w2): r.c for r in bigrams.collect()}
    exp_b, exp_u, exp_v = _py_fit(CORPUS)
    assert got == exp_b
    assert {r.w1: r.c for r in unigrams.collect()} == exp_u
    assert v == exp_v
    # left-context counts are the conditional's denominator by construction
    assert exp_u["the"] == sum(c for (w1, _), c in exp_b.items() if w1 == "the")


def test_empty_document_yields_bos_eos(spark):
    rows = [("e", ""), ("p", "  ...  ")]
    pairs = doc_bigrams(_docs(spark, rows)).collect()
    assert {(r.doc_id, r.w1, r.w2) for r in pairs} == {
        ("e", BOS, EOS),
        ("p", BOS, EOS),
    }


def test_perplexity_matches_reference(spark):
    docs = _docs(spark)
    bigrams, unigrams, v = fit_bigram_lm(docs)
    got = {r.doc_id: (r.n_bigrams, r.ppl) for r in
           perplexity(docs, bigrams, unigrams, v, k=0.5).collect()}
    big, uni, _ = _py_fit(CORPUS)
    for doc_id, text in CORPUS:
        n, ppl = got[doc_id]
        assert n == len(_py_pairs(text))
        assert ppl == pytest.approx(_py_ppl(text, big, uni, v, k=0.5), rel=1e-9)


def test_in_domain_scores_below_gibberish(spark):
    train = _docs(spark)
    bigrams, unigrams, v = fit_bigram_lm(train)
    test = _docs(
        spark,
        [("good", "the cat sat"), ("junk", "zxq qqv wvx zzk pqr")],
    )
    scores = {r.doc_id: r.ppl for r in
              perplexity(test, bigrams, unigrams, v).collect()}
    assert scores["good"] < scores["junk"]
    kept = filter_by_perplexity(
        test, perplexity(test, bigrams, unigrams, v),
        max_ppl=(scores["good"] + scores["junk"]) / 2,
    )
    assert [r.doc_id for r in kept.select("doc_id").collect()] == ["good"]


def test_parallelism_invariant_scores(spark):
    # decimal log-prob sums are exact and order-free: identical ppl bits
    # whatever the partitioning of the pair stream
    docs = _docs(spark)
    bigrams, unigrams, v = fit_bigram_lm(docs)
    a = perplexity(docs.repartition(1), bigrams, unigrams, v).collect()
    b = perplexity(docs.repartition(7), bigrams, unigrams, v).collect()
    assert {(r.doc_id, r.ppl) for r in a} == {(r.doc_id, r.ppl) for r in b}


def test_parameter_validation(spark):
    docs = _docs(spark)
    bigrams, unigrams, v = fit_bigram_lm(docs)
    with pytest.raises(ValueError):
        perplexity(docs, bigrams, unigrams, v, k=0.0)
    with pytest.raises(ValueError):
        perplexity(docs, bigrams, unigrams, vocab_size=0)


def test_null_text_scored_not_dropped(spark):
    # a NULL-text row is an empty document: it gets a (BOS,EOS) score row
    # and survives filter_by_perplexity like any other document
    rows = [("d1", "the cat sat"), ("dn", None)]
    docs = _docs(spark, rows)
    bigrams, unigrams, v = fit_bigram_lm(docs)
    scores = perplexity(docs, bigrams, unigrams, v)
    got = {r.doc_id: r.n_bigrams for r in scores.collect()}
    assert got["dn"] == 1  # the lone (BOS, EOS) pair
    kept = filter_by_perplexity(docs, scores, max_ppl=1e9)
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {"d1", "dn"}

"""Bigram language-model quality scoring — the CCNet-style corpus filter.

Beyond-reference operator (LLM-data-pipeline family): the canonical
Common-Crawl curation step scores every document's perplexity under a
language model trained on trusted text and drops the high-perplexity
tail (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020 — there a KenLM 5-gram; here
the same pipeline shape with an add-k-smoothed bigram model, which is
the right scope for a from-scratch engine: the *distribution* pattern
is what matters, the LM order is a parameter of the same plan).

Spark-first shape:

* FIT scans the corpus-sized pair stream ONCE (map-side partial
  counts, one exchange on (w1, w2)); the unigram table folds from the
  resulting small count table, never from the corpus again. The
  token->pair kernel is pure Catalyst array expressions (lower/split/
  filter/slice/arrays_zip/explode): no UDF, no Python.
* SCORE is two left joins of the document pair stream against the count
  tables followed by a per-doc aggregation. Join strategy is left to
  Catalyst/AQE: a small model broadcasts, a web-scale model sort-merge
  joins on its natural keys. Per-token log-probabilities are summed as
  DECIMAL(38, 18) — float sums are shuffle-order-dependent; the decimal
  sum is exact and therefore order-free, keeping the operator
  bit-deterministic across parallelism (the repo-wide invariant).
* Tokenization is the deliberately-simple ASCII word normalizer
  (lowercase, split on non-[a-z0-9] runs): CCNet normalizes aggressively
  before its LM for exactly this reason, and the simple rule is
  expressible identically in any engine (the DuckDB oracle re-derives
  the pair stream with its own list primitives).
"""

from __future__ import annotations

from typing import Tuple

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

BOS = "<s>"
EOS = "</s>"

_TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(text: Column) -> Column:
    # NULL text is an empty document (split(NULL) is NULL and would
    # otherwise silently erase the row from every downstream count)
    return F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), _TOKEN_SPLIT),
        lambda x: x != "",
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word ``n``-grams of a token array (empty array when
    the document has fewer than ``n`` tokens) — the one shared gram
    kernel (``decontaminate`` and ``gopher_quality`` both build on it).
    Pure per-row array expressions."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_bigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, w1, w2)`` — one row per bigram occurrence, with BOS/EOS
    sentinels (a document with tokens t1..tn yields (BOS,t1), (t1,t2),
    ..., (tn,EOS); an empty or NULL-text document yields (BOS,EOS), so
    every input row stays visible to scoring and filtering). Map-side
    only."""
    padded = F.concat(
        F.array(F.lit(BOS)), _tokens(F.col(text_col)), F.array(F.lit(EOS))
    )
    pair = F.explode(
        F.arrays_zip(
            F.slice(padded, 1, F.size(padded) - 1).alias("w1"),
            F.slice(padded, 2, F.size(padded) - 1).alias("w2"),
        )
    )
    return docs.select("doc_id", pair.alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def fit_bigram_lm(
    docs: DataFrame, text_col: str = "text"
) -> Tuple[DataFrame, DataFrame, int]:
    """Count tables of the bigram LM: ``(bigrams(w1, w2, c),
    unigrams(w1, c), vocab_size)``.

    ``unigrams`` counts each token's occurrences as a bigram LEFT context
    (so c(w1) == sum_w2 c(w1, w2), the denominator the conditional needs;
    EOS therefore never appears in it). ``vocab_size`` is the number of
    distinct RIGHT-context types incl. EOS — the add-k smoothing
    denominator |V| such that sum_w2 p(w2|w1) == 1. One exchange per
    aggregate; the scalar vocab count is the only driver-side value."""
    pairs = doc_bigrams(docs, text_col)
    bigrams = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    # c(w1) == sum_w2 c(w1,w2) by construction, so the unigram table
    # folds from the (small) bigram count table instead of re-exploding
    # and re-shuffling the corpus-sized pair stream a second time
    unigrams = bigrams.groupBy("w1").agg(F.sum("c").alias("c"))
    vocab_size = bigrams.select("w2").distinct().count()
    return bigrams, unigrams, int(vocab_size)


def perplexity(
    docs: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    vocab_size: int,
    k: float = 1.0,
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram perplexity under the fitted model:
    ``(doc_id, n_bigrams, ppl)``.

    p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k*|V|); ppl = 2^H where H is
    the mean negative log2 probability over the document's bigrams
    (BOS/EOS included, the standard convention). Unseen words and
    contexts fall back to the smoothing mass via the left joins'
    null -> 0. Per-row log2 values are cast to DECIMAL(38,18) before the
    per-doc sum so the aggregation is exact and shuffle-order-free."""
    if k <= 0:
        raise ValueError(f"smoothing k must be > 0, got {k}")
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    pairs = doc_bigrams(docs, text_col)
    b = bigrams.select(
        F.col("w1").alias("b_w1"), F.col("w2").alias("b_w2"), F.col("c").alias("c2")
    )
    u = unigrams.select(F.col("w1").alias("u_w1"), F.col("c").alias("c1"))
    scored = (
        pairs.join(b, (pairs["w1"] == b["b_w1"]) & (pairs["w2"] == b["b_w2"]), "left")
        .join(u, pairs["w1"] == u["u_w1"], "left")
        .select(
            "doc_id",
            F.log2(
                (F.coalesce("c2", F.lit(0)).cast("double") + F.lit(float(k)))
                / (
                    F.coalesce("c1", F.lit(0)).cast("double")
                    + F.lit(float(k) * vocab_size)
                )
            )
            .cast("decimal(38,18)")
            .alias("logp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.pow(
            F.lit(2.0),
            (-F.sum("logp").cast("double")) / F.count(F.lit(1)).cast("double"),
        ).alias("ppl"),
    )


def filter_by_perplexity(
    docs: DataFrame,
    scores: DataFrame,
    max_ppl: float,
) -> DataFrame:
    """Corpus curation: keep documents whose perplexity is at most
    ``max_ppl`` (CCNet's head/middle cut is a quantile of this score —
    compute the threshold with ``approxQuantile`` and pass it here).
    Anti-join-free: a semi join on the kept score rows."""
    keep = scores.where(F.col("ppl") <= F.lit(float(max_ppl))).select("doc_id")
    return docs.join(keep, "doc_id", "left_semi")

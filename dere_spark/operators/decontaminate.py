"""Benchmark decontamination: flag/drop corpus docs overlapping eval sets.

Beyond-reference operator (LLM-data-pipeline family): before training on
a web corpus you must remove documents that contain benchmark material,
or downstream evals are meaningless. The standard mechanism (GPT-3
appendix C; The Pile; most open LLM reports) is exact n-gram overlap:
a document is contaminated when it shares at least one word-level
n-gram with any benchmark text.

Spark-first shape:

* The n-gram kernel is map-side Catalyst arrays (``transform`` over a
  ``sequence`` of start offsets + ``slice``) — NO window, NO shuffle to
  build grams, unlike the MinHash shingler in ``operators/dedup.py``
  which rides an existing per-doc window. Dedup needs token order from
  a token TABLE; here we own tokenization, so the array form is free.
* The benchmark side is tiny by definition (eval sets are KBs-MBs
  against a 100 TB corpus): its distinct gram set broadcasts, so the
  flagging join adds no corpus-side exchange beyond the distinct on
  (doc_id, gram). At larger benchmark batteries, hash grams to 64-bit
  (``xxhash64``) on both sides to cut shuffle width — noted, not
  default, because exact strings keep the operator oracle-checkable.
* Tokenization is the same ASCII word normalizer as
  ``operators/ngram_lm.py`` (lowercase, split on non-[a-z0-9] runs) —
  contamination checks normalize aggressively so formatting differences
  can't hide overlap.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from dere_spark.operators.ngram_lm import _tokens, word_ngrams


def _gram_array(text: Column, n: int) -> Column:
    return word_ngrams(_tokens(text), n)


def ngram_set(docs: DataFrame, n: int = 8, text_col: str = "text") -> DataFrame:
    """``(doc_id, gram)`` — the distinct word-level n-grams of each doc.
    Documents shorter than ``n`` tokens contribute no rows."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return (
        docs.select("doc_id", F.explode(_gram_array(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_shared)`` for every corpus document sharing at least
    one word-level ``n``-gram with any benchmark text — ``n_shared`` is
    the number of DISTINCT shared grams (audit signal: 1 is a collision
    candidate, hundreds is a verbatim inclusion). The benchmark gram set
    is deduped and broadcast."""
    doc_grams = ngram_set(docs, n=n, text_col=text_col)
    # benchmark side: doc_id is irrelevant, so skip ngram_set's per-doc
    # distinct (its exchange would be pure waste) — explode and dedupe
    # the gram column directly, one exchange total
    bench_grams = (
        benchmark.select(
            F.explode(_gram_array(F.col(text_col), n)).alias("gram")
        ).distinct()
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """The curation cut: corpus minus every document flagged by
    ``contamination_hits`` (left anti join on the flagged ids)."""
    flagged = contamination_hits(docs, benchmark, n=n, text_col=text_col).select(
        "doc_id"
    )
    return docs.join(flagged, "doc_id", "left_anti")

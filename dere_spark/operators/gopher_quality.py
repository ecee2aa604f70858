"""Gopher-style repetition / composition quality filters.

Beyond-reference operator (LLM-data-pipeline family): the repetition
rules from Rae et al., "Scaling Language Models: Methods, Analysis &
Insights from Training Gopher" (2021, Table A1) are the standard
heuristic quality gate in modern corpus pipelines (Dolma, FineWeb,
RefinedWeb all ship variants): drop documents that are too short / too
long, dominated by one repeated word, or dominated by one repeated
word pair.

Spark-first shape: every statistic is a per-row LINEAR fold over the
document's sorted token array — ``array_sort`` + ``aggregate`` run-length
scan gives each value's max multiplicity without a per-doc hash map,
without exploding the corpus, and without any shuffle (a quality filter
must ride the ingest scan; an explode + groupBy(doc_id, token) shape
would shuffle the entire token stream of a 100 TB corpus just to
compute per-row numbers). All outputs are exact integers so the driver
gate's DuckDB oracle can re-derive them idiomatically (unnest + group)
and hash-compare without float caveats; the fraction thresholds in
``gopher_filter`` divide those integers per-row (single IEEE ops —
deterministic).

Tokenization shares the ASCII word normalizer with ``ngram_lm`` /
``decontaminate`` (NULL text = empty document).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from dere_spark.operators.ngram_lm import _tokens, word_ngrams


def _max_multiplicity(arr: Column) -> Column:
    """Max number of times any single value occurs in ``arr`` — a linear
    run-length fold over the sorted array (0 for an empty array). The ''
    sentinel for ``prev`` is safe: tokens and 2-grams are never empty."""
    sorted_arr = F.array_sort(arr)
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        step,
        lambda acc: acc["best"],
    )


def _2grams(toks: Column) -> Column:
    return word_ngrams(toks, 2)


_STAT_NAMES = (
    "n_words", "n_distinct", "word_chars", "top_word_n", "n_2grams",
    "top_2gram_n",
)


def _stat_cols(text_col: str) -> list:
    toks = _tokens(F.col(text_col))
    grams = _2grams(toks)
    return [
        F.size(toks).alias("n_words"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("word_chars"),
        _max_multiplicity(toks).alias("top_word_n"),
        F.size(grams).alias("n_2grams"),
        _max_multiplicity(grams).alias("top_2gram_n"),
    ]


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact per-document composition counters:

    ``(doc_id, n_words, n_distinct, word_chars, top_word_n, n_2grams,
    top_2gram_n)`` — token count, distinct-token count, total characters
    across tokens (mean word length = word_chars / n_words), the top
    word's multiplicity, 2-gram count, and the top 2-gram's multiplicity.
    Map-side only; every column is an exact integer."""
    return docs.select("doc_id", *_stat_cols(text_col))


def gopher_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_top_word_frac: float = 0.2,
    max_top_2gram_frac: float = 0.2,
    min_distinct_frac: float = 0.1,
) -> DataFrame:
    """The Gopher repetition cut: keep documents passing every rule
    (defaults follow the paper's Table A1 where a bigram analog exists).
    Thresholds are per-row single-IEEE-op comparisons over the exact
    integer stats — deterministic under any partitioning.

    Every rule is a per-row expression, so the cut is a plain
    Filter-over-Project — NO join, NO shuffle, one scan (stat columns
    are attached inline, filtered on, then dropped; the input must not
    already carry columns named like the stats). ``filter_by_perplexity``
    needs its semi join because scores come from aggregations; here they
    don't."""
    clash = set(_STAT_NAMES) & set(docs.columns)
    if clash:
        raise ValueError(f"docs already has stat columns: {sorted(clash)}")
    s = docs.select("*", *_stat_cols(text_col))
    n = F.col("n_words").cast("double")
    ok = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("word_chars").cast("double") / n >= min_mean_word_len)
        & (F.col("word_chars").cast("double") / n <= max_mean_word_len)
        & (F.col("top_word_n").cast("double") / n <= max_top_word_frac)
        & (
            (F.col("n_2grams") == 0)
            | (
                F.col("top_2gram_n").cast("double")
                / F.col("n_2grams").cast("double")
                <= max_top_2gram_frac
            )
        )
        & (F.col("n_distinct").cast("double") / n >= min_distinct_frac)
    )
    return s.where(ok).drop(*_STAT_NAMES)

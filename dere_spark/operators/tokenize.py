"""Offset-preserving tokenization — entirely JVM-side (no Python UDF).

The reference tokenizes with an offset-preserving tokenizer so spans can be
addressed as character intervals over the instance text (reference:
dere/models/_baseline/span_classifier.py:361 span_tokenize; span identity
is (doc, type, left, right), dere/corpus.py:206-220). We reproduce the
offset contract with pure Spark builtins:

    tokens = posexplode(split(text, sep))
    left   = prefix-sum of (len(token)+len(sep)) over the token window
    right  = left + len(token)

so ``substring(text, left+1, right-left) == token`` holds byte-for-byte —
that equality IS the reference's round-trip invariant and is exposed as a
checkable DataFrame (`fidelity_violations`).

Scale: the offset prefix-sum is a window over (doc_id, token_idx). Because
`load_documents` hash-partitions the corpus on doc_id up front, the window's
required distribution is ALREADY satisfied — Catalyst inserts no exchange,
only a per-partition sort. Net shuffle cost of tokenization: zero. (An
array-level higher-order-function prefix sum was benchmarked and rejected:
array append inside ``aggregate`` is O(n²) per document.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def tokenize(documents: DataFrame, sep: str = " ", text_col: str = "text") -> DataFrame:
    """documents(doc_id, text, ...) -> tokens(doc_id, token_idx, token, left, right).

    Whitespace tokenizer with exact character offsets. Deterministic and
    order-stable across parallelism levels (offsets derived from token_idx,
    never from physical row order).
    """
    toks = documents.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), F.lit(sep), -1)).alias("token_idx", "token"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("token_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = toks.withColumn(
        "left",
        F.coalesce(F.sum(F.length("token") + len(sep)).over(w), F.lit(0)).cast("int"),
    ).withColumn("right", (F.col("left") + F.length("token")).cast("int"))
    return toks


def fidelity_violations(documents: DataFrame, tokens: DataFrame) -> DataFrame:
    """Rows where substring(text, left, right) != token — must be empty.

    This is the engine-level analog of the reference's load-time assertion
    ``span.text == span_string`` (brat_corpus_io.py:158): every span/token
    must reproduce its surface string byte-identically from (left, right).
    """
    joined = tokens.join(documents.select("doc_id", "text"), "doc_id")
    return joined.where(
        F.expr("substring(text, left + 1, right - left)") != F.col("token")
    ).select("doc_id", "token_idx", "token", "left", "right")

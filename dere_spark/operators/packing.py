"""Training-shard packing: assign documents to fixed-token-budget shards.

Beyond-reference operator (LLM-data-pipeline family): the last step
before tokenized text reaches a trainer is packing documents into
fixed-size shards/sequences (Megatron/GPT-NeoX data prep, Dolma's
shard writer). The assignment must be DETERMINISTIC — resuming a
half-written prep job must land every document in the same shard.

Spark-first shape: a global greedy first-fit is inherently sequential,
so the scalable formulation buckets documents by a content-derived key
(md5 prefix — same family as ``corpus_ops.split_bucket``) and packs
WITHIN buckets: each bucket's documents are ordered deterministically
(md5, doc_id tie-break), a window cumulative token sum runs per bucket
(one hash exchange on the bucket key — bounded, tunable parallelism),
and a document lands in shard ``floor(cumsum_exclusive / budget)``.

Semantics: SOFT capacity. A shard holds a consecutive run of the
bucket's document order and may overflow its budget by (at most) the
tail of its last document — documents are never split (that is the
tokenizer consumer's decision, not the packer's). Consequently an
oversized document forces every LATER document into a later shard, but
may itself share a shard with the small documents that preceded it
inside its budget range. ``doc_id`` must be unique (it is the corpus
identity key everywhere in this engine); duplicate ids would make the
tie-broken order — and therefore the assignment — partition-dependent.
Every output value is an exact integer over a deterministic order, so
the driver gate hash-compares against an independent DuckDB window
re-derivation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from dere_spark.operators.corpus_ops import md5_prefix_long
from dere_spark.operators.ngram_lm import _tokens


def pack_shards(
    docs: DataFrame,
    token_budget: int = 2048,
    num_buckets: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, bucket, n_tokens, shard)`` — shard ids are local to
    their bucket (the global shard identity is the pair (bucket, shard));
    ``n_tokens`` is the whitespace-word count of the ASCII-normalized
    text (a proxy the real tokenizer replaces 1:1 — the plan shape is
    identical for any per-row count expression)."""
    if token_budget < 1:
        raise ValueError(f"token_budget must be >= 1, got {token_budget}")
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    key = F.md5(F.col("doc_id").cast("string"))
    bucket = (md5_prefix_long(F.col("doc_id")) % num_buckets).alias("bucket")
    base = docs.select(
        "doc_id",
        bucket,
        key.alias("_ord"),
        F.size(_tokens(F.col(text_col))).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("_ord"), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / F.lit(int(token_budget)))
        .cast("int")
        .alias("shard"),
    )


def shard_sizes(packed: DataFrame) -> DataFrame:
    """Audit view: ``(bucket, shard, n_docs, total_tokens)`` — the
    overflow distribution is a data-prep report metric (soft capacity
    means total_tokens can exceed the budget by one document's tail)."""
    return packed.groupBy("bucket", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )

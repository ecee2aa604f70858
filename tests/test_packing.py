"""Shard packing (operators/packing.py): deterministic assignment,
soft-capacity semantics, oversized docs, partitioning invariance."""

from __future__ import annotations

import hashlib

import pytest
import pyspark.sql.functions as F

from dere_spark.operators.packing import pack_shards, shard_sizes


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _py_pack(rows, budget, num_buckets=1):
    # independent reference: md5 order, exclusive-cumsum // budget
    out = {}
    per_bucket = {}
    for doc_id, text in rows:
        h = hashlib.md5(doc_id.encode()).hexdigest()
        b = int(h[:8], 16) % num_buckets
        per_bucket.setdefault(b, []).append((h, doc_id, len(text.split())))
    for b, docs in per_bucket.items():
        cum = 0
        for h, doc_id, n in sorted(docs):
            out[doc_id] = (b, n, cum // budget)
            cum += n
    return out


def test_matches_reference_and_soft_capacity(spark):
    rows = [(f"d{i}", " ".join(["w"] * (3 + i % 5))) for i in range(40)]
    got = {
        r.doc_id: (r.bucket, r.n_tokens, r.shard)
        for r in pack_shards(_docs(spark, rows), token_budget=10,
                             num_buckets=1).collect()
    }
    assert got == _py_pack(rows, budget=10)
    # token conservation: every token lands in exactly one shard (soft
    # capacity means per-shard totals can sit on either side of the
    # budget when a neighbor's tail spills into the next range — the
    # reference comparison above pins those semantics exactly)
    sizes = shard_sizes(
        pack_shards(_docs(spark, rows), token_budget=10, num_buckets=1)
    ).collect()
    assert sum(s.total_tokens for s in sizes) == sum(
        3 + i % 5 for i in range(40)
    )


def test_oversized_doc_forces_successors_into_later_shards(spark):
    # construct the fixture so the oversized doc is provably FIRST in
    # md5 order within the bucket: its exclusive cumsum is 0 (shard 0)
    # and every successor must start at cumsum >= 100 (shard >= 10)
    candidates = [f"x{i}" for i in range(50)]
    order = sorted(candidates, key=lambda d: hashlib.md5(d.encode()).hexdigest())
    big, small1, small2 = order[0], order[1], order[2]
    rows = [(big, " ".join(["w"] * 100)), (small1, "x y"), (small2, "x y z")]
    got = {r.doc_id: (r.n_tokens, r.shard)
           for r in pack_shards(_docs(spark, rows), token_budget=10,
                                num_buckets=1).collect()}
    assert got == {d: (n, s) for d, (_, n, s) in _py_pack(rows, budget=10).items()}
    assert got[big] == (100, 0)
    assert got[small1][1] == 10  # floor(100 / 10)
    assert got[small2][1] == 10  # floor(102 / 10)


def test_deterministic_across_partitioning(spark):
    rows = [(f"d{i}", " ".join(["tok"] * (1 + i % 7))) for i in range(200)]
    docs = _docs(spark, rows)
    a = {(r.doc_id, r.bucket, r.shard)
         for r in pack_shards(docs, token_budget=16).collect()}
    b = {(r.doc_id, r.bucket, r.shard)
         for r in pack_shards(docs.repartition(13), token_budget=16).collect()}
    assert a == b


def test_bucket_exchange_only(spark):
    docs = _docs(spark, [("d", "a b c")])
    plan = pack_shards(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the one bucket-key exchange


def test_parameter_validation(spark):
    docs = _docs(spark, [("d", "a b c")])
    with pytest.raises(ValueError):
        pack_shards(docs, token_budget=0)
    with pytest.raises(ValueError):
        pack_shards(docs, num_buckets=0)

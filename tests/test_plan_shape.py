"""Scale-guard regression tests: the PLAN is an artifact. These fail if a
future change sneaks an extra shuffle, breaks scan pruning, or loses
partition pruning at the graph sink."""

from __future__ import annotations

import re
from collections import Counter

import pyspark.sql.functions as F
import pytest

from dere_spark.operators.triples import write_triples
from dere_spark.webtext import build_stages


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pipeline_shuffle_budget(spark, sf_dir):
    """The corpus is shuffled EXACTLY ONCE: the plan's only data-exchange
    key is hashpartitioning(doc_id) (the tokenizer-window subtree, printed
    once per self-join side — the SAME exchange reused at runtime by AQE).
    The banded candidate join keys on (doc_id, bucket) but REUSES the
    doc_id partitioning as a valid co-partitioning
    (spark.sql.requireAllClusterKeysForCoPartition=false, session.py) —
    equal (doc_id, bucket) pairs necessarily share a doc_id partition, so
    forcing a re-shuffle on all join keys would be pure waste. Downstream
    windows include the bucket in their partition keys and also reuse it.
    Dimension joins must all be broadcasts. (A 2-exchange Arrow-tokenizer
    variant was measured and rejected: see webtext.py's note.)"""
    plan = _executed_plan(build_stages(spark, sf_dir)["triples"])
    counts = Counter(re.findall(r"(\w*Exchange\w*)", plan))
    data_exchanges = counts.get("Exchange", 0)
    assert data_exchanges <= 2, f"shuffle crept in: {counts}\n{plan[:2000]}"
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    for k in keys:
        cols = [c.split("#")[0].strip() for c in k.split(",")[:-1]]
        assert cols == ["doc_id"], f"unexpected exchange key: {k}"
    assert counts.get("BroadcastExchange", 0) >= 3  # gaz, whitelist, dictionaries


def test_candidate_join_is_banded(spark, sf_dir):
    """The J1 self-join's equi-key must carry the token-distance band
    bucket — (doc_id, bucket) — so a giant page cannot materialize O(n²)
    rows inside the join (VERDICT r1 'What's wrong' #3)."""
    plan = _executed_plan(build_stages(spark, sf_dir)["pairs"])
    joins = re.findall(
        r"(?:SortMergeJoin|ShuffledHashJoin)\w*\s+\[([^\]]*)\],\s*\[([^\]]*)\]", plan
    )
    assert joins, f"no shuffled join found in pairs plan:\n{plan[:1500]}"
    for left, right in joins:
        lcols = {c.split("#")[0].strip() for c in left.split(",")}
        rcols = {c.split("#")[0].strip() for c in right.split(",")}
        assert "bucket" in lcols and "bucket" in rcols, (
            f"self-join equi-key lost the band bucket: [{left}] vs [{right}]"
        )
        assert "doc_id" in lcols and "doc_id" in rcols


def test_scan_column_pruning(spark, sf_dir):
    """The documents scan must read ONLY (doc_id, text) for the triples
    plan — lang/source (and a production html:binary) must be pruned."""
    plan = _executed_plan(build_stages(spark, sf_dir)["triples"])
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, "no FileScan found"
    for s in schemas:
        cols = {c.split(":")[0] for c in s.split(",")}
        assert cols <= {"doc_id", "text"}, f"scan reads too much: {cols}"


def test_triples_sink_partition_pruning(spark, sf_dir, tmp_path):
    """write_triples partitions by pred; a pred-filtered readback must
    prune partitions at the scan (PartitionFilters non-empty)."""
    out = str(tmp_path / "triples")
    write_triples(build_stages(spark, sf_dir)["triples"], out)
    back = spark.read.parquet(out).where(F.col("pred") == "Operation.Manner")
    plan = _executed_plan(back)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "pred" in m.group(1), f"partition pruning lost:\n{plan[:1500]}"
    # and the data is really there, split by predicate
    assert back.count() > 0
    preds = {r["pred"] for r in spark.read.parquet(out).select("pred").distinct().collect()}
    assert preds == {"Operation.Theme", "Operation.Manner"}


def test_gazetteer_join_is_broadcast(spark, sf_dir):
    plan = _executed_plan(build_stages(spark, sf_dir)["spans"])
    assert "BroadcastHashJoin" in plan
    # token stream side must not sort-merge against the gazetteer
    assert plan.count("SortMergeJoin") == 0


def test_filter_near_dups_no_forced_broadcast(spark, sf_dir):
    """filter_near_dups must NOT force-broadcast the loser list: on the
    dup-heavy corpora this operator targets, the non-representative side is
    unbounded (billions of ids at 100 TB with a 30-50% dup rate), and a
    hard F.broadcast hint bypasses autoBroadcastJoinThreshold. Strategy is
    left to the optimizer/AQE: with the threshold disabled, the plan must
    fall back to a shuffled LeftAnti join (proving no ResolvedHint pins
    broadcast); with defaults, a genuinely-small loser list may still
    broadcast — both shapes keep the LeftAnti semantics."""
    from dere_spark.operators.dedup import filter_near_dups

    docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"), F.lit("t").alias("text"))
    clusters = spark.range(0, 200).select(
        F.col("id").alias("node"), (F.col("id") - F.col("id") % 2).alias("component")
    )
    out = filter_near_dups(docs, clusters)
    assert "ResolvedHint" not in out._jdf.queryExecution().analyzed().toString()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _executed_plan(filter_near_dups(docs, clusters))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "LeftAnti" in plan, plan[:1500]
    assert "BroadcastHashJoin" not in plan, (
        "loser-list broadcast is pinned by a hint; it must be optimizer-chosen:\n"
        + plan[:1500]
    )
    # semantics: odd ids 1..199 are non-representatives -> 100 losers dropped
    assert out.count() == 900


def test_fused_lsh_single_exchange(spark):
    """lsh_bands_fused must add exactly ONE data exchange (the
    groupBy(doc_id) that collects each doc's shingles) on top of its
    input — the whole point of fusing minhash + banding is that the
    signature table and the band pre-aggregation never cross the wire
    (the staged chain pays 3 exchanges)."""
    from dere_spark.operators.dedup import lsh_bands_fused

    sh = spark.createDataFrame(
        [(f"d{i}", f"sh{j}") for i in range(5) for j in range(8)],
        "doc_id string, shingle string",
    )
    plan = _executed_plan(lsh_bands_fused(sh, 16, 4))
    data_exchanges = len(re.findall(r"(?<!Broadcast)Exchange hashpartitioning", plan))
    assert data_exchanges == 1, f"fused LSH gained an exchange:\n{plan[:1500]}"

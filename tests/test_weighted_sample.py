"""Mixture sampling (corpus_ops.weighted_sample): rates, determinism,
allowlist semantics, independence across seeds, plan shape."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from dere_spark.operators.corpus_ops import weighted_sample


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )


def test_rates_and_allowlist(spark):
    docs = _docs(spark)
    kept = weighted_sample(docs, {"en": 0.5}, seed=1)
    rows = kept.collect()
    assert all(r.lang == "en" for r in rows)  # de absent from the mixture
    # 200 en docs at 0.5: expect ~100, tolerate wide noise but not
    # degenerate outcomes
    assert 60 <= len(rows) <= 140
    full = weighted_sample(docs, {"en": 1.0, "de": 1.0}, seed=1)
    assert full.count() == 400
    none = weighted_sample(docs, {"en": 0.0}, seed=1)
    assert none.count() == 0


def test_deterministic_across_partitioning_and_seeded(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in weighted_sample(docs, {"en": 0.3}, seed=9).collect()}
    b = {
        r.doc_id
        for r in weighted_sample(docs.repartition(7), {"en": 0.3}, seed=9).collect()
    }
    assert a == b
    c = {r.doc_id for r in weighted_sample(docs, {"en": 0.3}, seed=10).collect()}
    assert a != c  # different seeds draw different samples


def test_nested_rates_monotone(spark):
    # the same seed's draws are nested: a 0.2 sample is a subset of the
    # 0.5 sample (a property uniform-bucket sampling must have)
    docs = _docs(spark)
    small = {r.doc_id for r in weighted_sample(docs, {"en": 0.2}, seed=3).collect()}
    big = {r.doc_id for r in weighted_sample(docs, {"en": 0.5}, seed=3).collect()}
    assert small <= big


def test_map_side_only(spark):
    plan = (
        weighted_sample(_docs(spark), {"en": 0.5}, seed=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_parameter_validation(spark):
    with pytest.raises(ValueError):
        weighted_sample(_docs(spark), {"en": 1.5})
    with pytest.raises(ValueError):
        weighted_sample(_docs(spark), {"en": -0.1})

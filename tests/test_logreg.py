"""fit_logistic_distributed: weight parity with the driver-local fit,
bit-determinism across repeats, and the no-driver-collect contract.

VERDICT r1 'What's wrong' #2: the local fit collects the full training
set; the distributed fit must reach identical weights while only
num_buckets rows of partial gradients ever leave the executors.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from dere_spark.operators.logreg import fit_logistic, fit_logistic_distributed


@pytest.fixture(scope="module")
def train_df(spark):
    return spark.range(3000).select(
        (F.col("id") % 97 / 97.0).alias("x1"),
        (F.col("id") % 31 / 31.0).alias("x2"),
        ((F.col("id") % 13 / 13.0) - 0.5).alias("x3"),
        ((F.col("id") % 7) == 0).cast("int").alias("label"),
    )


def test_distributed_matches_local(train_df):
    cols = ["x1", "x2", "x3"]
    local = fit_logistic(train_df, cols, iterations=40)
    dist = fit_logistic_distributed(train_df, cols, iterations=40, num_buckets=16)
    assert np.allclose(local.weights, dist.weights, rtol=1e-6, atol=1e-9)
    assert np.allclose(local.bias, dist.bias, rtol=1e-6, atol=1e-9)


def test_distributed_bit_deterministic(train_df):
    cols = ["x1", "x2", "x3"]
    a = fit_logistic_distributed(train_df, cols, iterations=8, num_buckets=16)
    b = fit_logistic_distributed(train_df, cols, iterations=8, num_buckets=16)
    # content-hash bucketing + sorted buckets + ordered driver fold
    # => bit-identical, not merely close
    assert a == b


def test_distributed_never_collects_training_rows(train_df, monkeypatch):
    """Every collect() inside the fit must return at most num_buckets+1
    rows — the training data itself stays on the executors."""
    # pyspark 4: pyspark.sql.DataFrame is abstract; patch the concrete class
    from pyspark.sql.classic.dataframe import DataFrame

    real_collect = DataFrame.collect
    sizes = []

    def spy(self):
        out = real_collect(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(DataFrame, "collect", spy)
    fit_logistic_distributed(train_df, ["x1", "x2"], iterations=3, num_buckets=8)
    assert sizes, "fit ran no jobs?"
    assert max(sizes) <= 9, f"training rows reached the driver: {max(sizes)}"


def test_empty_training_set_raises(spark):
    df = spark.range(0).select(
        F.col("id").cast("double").alias("x1"),
        F.lit(0).cast("int").alias("label"),
    )
    with pytest.raises(ValueError):
        fit_logistic_distributed(df, ["x1"], iterations=2)


def test_all_negative_class_parity(spark):
    """Degenerate all-negative training set: the collect path's mean
    normalization is a no-op (every sample weight 1.0); the distributed
    path must match — computing the mean from CLAMPED class counts used
    to halve every weight and break the ~1e-9 parity contract."""
    df = spark.range(200).select(
        (F.col("id") % 7 / 7.0).alias("x1"),
        ((F.col("id") % 5 / 5.0) - 0.3).alias("x2"),
        F.lit(0).alias("label"),
    )
    cols = ["x1", "x2"]
    local = fit_logistic(df, cols, iterations=30)
    dist = fit_logistic_distributed(df, cols, iterations=30)
    np.testing.assert_allclose(dist.weights, local.weights, atol=1e-9)
    np.testing.assert_allclose(dist.bias, local.bias, atol=1e-9)

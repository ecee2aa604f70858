"""Pure-numpy logistic regression — the M3/M4 learner without sklearn.

The reference's slot classifier is a LinearSVC over sparse features
(dere/models/_baseline/slot_classifier.py:64-137). This is the same
train-distributed/score-distributed contract with a dependency-free
learner: features are assembled relationally (Spark), the (small) design
matrix is collected to the driver, fitted with full-batch gradient descent
(deterministic: fixed init, fixed iteration count, float64), and the
resulting weight vector is pushed BACK INTO THE PLAN as literal columns —
scoring is a closed-form linear expression, JVM-side, no UDF at all.

L2-regularized, class-balanced (the reference uses class_weight='balanced',
slot_classifier.py:107-127): positive examples are up-weighted by
n_neg/n_pos.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class LogisticModel:
    feature_cols: Tuple[str, ...]
    weights: Tuple[float, ...]
    bias: float

    def score_column(self) -> Column:
        """The model as a Catalyst expression: sigmoid(w·x + b)."""
        z = F.lit(self.bias)
        for c, w in zip(self.feature_cols, self.weights):
            z = z + F.col(c).cast("double") * F.lit(w)
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def fit_logistic_distributed(
    train: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "label",
    l2: float = 1e-3,
    lr: float = 0.5,
    iterations: int = 300,
    num_buckets: int = 64,
) -> LogisticModel:
    """Full-batch GD with DISTRIBUTED gradients — no full-data collect.

    Per iteration, each content-hash bucket computes its partial
    sufficient statistics (Σ g·x, Σ g) with a JVM-side grouped
    aggregation — the gradient residual g = (σ(w·x + b) − y)·class_weight
    is a Catalyst expression over the CURRENT weights as literals, so the
    whole inner loop runs in whole-stage codegen with zero Python on the
    executors. Only ``num_buckets`` rows of d+1 scalars reach the driver,
    which folds them in fixed bucket order. The training set never leaves
    the executors — at a billions-of-rows J2 gold-arc pair table this is
    the scale path the driver-collect ``fit_logistic`` is not.

    Determinism across parallelism levels (the scaling criterion):
      * rows are bucketed by ``xxhash64`` of their CONTENT, not by
        physical partition — the same row lands in the same bucket at
        local[8] and local[32];
      * buckets are cached sorted (sortWithinPartitions), and each bucket
        lives in exactly one partition, so the per-bucket partial sum
        accumulates in a fixed row order;
      * the driver folds bucket partials in ascending bucket order.
    So the fitted weights are bit-identical across cluster sizes for a
    fixed ``num_buckets``. (They differ from ``fit_logistic`` only by
    float-summation order — parity is ~1e-9, covered by tests.)
    """
    d = len(feature_cols)
    cols = [F.col(c).cast("double").alias(c) for c in feature_cols] + [
        F.col(label_col).cast("double").alias("_y")
    ]
    names = list(feature_cols) + ["_y"]
    proj = train.select(*cols).withColumn(
        "_b", F.pmod(F.xxhash64(*names), F.lit(num_buckets)).cast("int")
    )
    data = (
        proj.repartition(num_buckets, "_b").sortWithinPartitions("_b", *names).persist()
    )
    try:
        head = data.agg(
            F.count(F.lit(1)).alias("n"), F.sum("_y").alias("n_pos")
        ).first()
        n = int(head["n"])
        if n == 0:
            raise ValueError("empty training set")
        true_pos = float(head["n_pos"] or 0.0)
        true_neg = float(n) - true_pos
        # identical scalar path to fit_logistic's sample_w normalization:
        # the RATIO clamps absent classes to 1 (like the collect path's
        # max(...,1)), but the mean is over the TRUE row counts — using
        # the clamped count there would halve every weight on an
        # all-negative set, where the collect path is a no-op
        w_pos_raw = max(true_neg, 1.0) / max(true_pos, 1.0)
        mean_w = (true_pos * w_pos_raw + true_neg * 1.0) / n
        w_pos = w_pos_raw / mean_w
        w_neg = 1.0 / mean_w

        w = np.zeros(d)
        b = 0.0
        for _ in range(iterations):
            z = F.lit(float(b))
            for c, wi in zip(feature_cols, w):
                z = z + F.col(c) * F.lit(float(wi))
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            g = (p - F.col("_y")) * F.when(
                F.col("_y") > 0.5, F.lit(w_pos)
            ).otherwise(F.lit(w_neg))
            aggs = [F.sum(g * F.col(c)).alias(f"gx{i}") for i, c in enumerate(feature_cols)]
            aggs.append(F.sum(g).alias("g"))
            parts = sorted(
                data.groupBy("_b").agg(*aggs).collect(), key=lambda r: r["_b"]
            )
            sum_gx = np.zeros(d)
            sum_g = 0.0
            for r in parts:
                for i in range(d):
                    sum_gx[i] += r[f"gx{i}"]
                sum_g += r["g"]
            w = w - lr * (sum_gx / n + l2 * w)
            b = b - lr * (sum_g / n)
    finally:
        data.unpersist()
    return LogisticModel(tuple(feature_cols), tuple(float(x) for x in w), float(b))


def fit_logistic(
    train: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "label",
    l2: float = 1e-3,
    lr: float = 0.5,
    iterations: int = 300,
) -> LogisticModel:
    """Collect (features, label) and fit full-batch GD.

    Deterministic: zero init, fixed schedule, float64; rows are collected
    through a sorted projection so the design matrix order is stable (GD
    on the full batch is order-free anyway; the sort guards against any
    future stochastic variant).
    """
    cols = list(feature_cols) + [label_col]
    rows = train.select(*cols).sort(*cols).collect()
    if not rows:
        raise ValueError("empty training set")
    X = np.array([[float(r[c]) for c in feature_cols] for r in rows], dtype=np.float64)
    y = np.array([float(r[label_col]) for r in rows], dtype=np.float64)
    n, d = X.shape
    n_pos = max(y.sum(), 1.0)
    n_neg = max(n - y.sum(), 1.0)
    sample_w = np.where(y > 0.5, n_neg / n_pos, 1.0)
    sample_w /= sample_w.mean()

    w = np.zeros(d)
    b = 0.0
    for _ in range(iterations):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = (p - y) * sample_w
        grad_w = X.T @ g / n + l2 * w
        grad_b = g.mean()
        w -= lr * grad_w
        b -= lr * grad_b
    return LogisticModel(tuple(feature_cols), tuple(float(x) for x in w), float(b))

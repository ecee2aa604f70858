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

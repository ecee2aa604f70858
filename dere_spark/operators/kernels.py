"""Arrow-batched model kernels — the UDF pattern for every learned stage.

The reference's compute kernels (CRF tagging, LinearSVC pair scoring —
dere/models/_baseline/span_classifier.py:204-226,
slot_classifier.py:139-168) are row-at-a-time Python. Here every kernel is
a ``mapInPandas`` iterator over Arrow batches with the model held in a
per-executor cache:

  * the model is broadcast ONCE (sc.broadcast); each executor deserializes
    it on first batch and reuses it for every subsequent batch — the
    load-once-per-executor contract the reference achieves with a single
    process (SURVEY §2.9 M2/M4);
  * batches are scored vectorized (numpy), never per-row;
  * kernels are deterministic and batch-order independent, so outputs are
    bit-stable across parallelism levels (the scaling criterion's
    correctness half).

`LinearPairScorer` is the drop-in slot-classifier stand-in: a fixed-weight
linear model over pair features. Being linear, its scores are also
expressible in SQL — which is exactly how the oracle checks that the UDF
path agrees with relational semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

def _cached_model(bc) -> object:
    """The load-once-per-executor contract: PySpark Broadcast caches its
    deserialized value per python worker process (Broadcast._value), so
    reading ``bc.value`` once per mapInPandas invocation deserializes at
    most once per worker, then every batch reuses the object."""
    return bc.value


@dataclass(frozen=True)
class LinearPairScorer:
    """score = w · features + bias, vectorized over a batch.

    Feature order is fixed by `feature_cols`; weights are plain floats so
    the model pickles cheaply into a broadcast.
    """

    feature_cols: Tuple[str, ...]
    weights: Tuple[float, ...]
    bias: float = 0.0

    def score(self, batch: pd.DataFrame) -> np.ndarray:
        X = batch[list(self.feature_cols)].to_numpy(dtype=np.float64)
        w = np.asarray(self.weights, dtype=np.float64)
        return X @ w + self.bias


def score_pairs_batched(
    pairs: DataFrame,
    model: LinearPairScorer,
    out_col: str = "model_score",
    round_digits: int = 6,
) -> DataFrame:
    """Batched pair scoring via mapInPandas (the M4 pattern).

    The full input schema passes through; one double column is appended.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = pairs.sparkSession
    bc = spark.sparkContext.broadcast(model)
    in_cols = [f.name for f in pairs.schema.fields]
    out_schema = StructType(
        list(pairs.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = _cached_model(bc)
        for batch in batches:
            scores = np.round(m.score(batch), round_digits)
            out = batch[in_cols].copy()
            out[out_col] = scores
            yield out

    return pairs.mapInPandas(run, out_schema)


@dataclass(frozen=True)
class GazetteerTagger:
    """Deterministic sequence-tagger stand-in for the CRF (M2): tags a
    token B-<type> when its lowercased surface is in the type's gazetteer.
    A learned tagger replaces `tag` without touching the plan around it."""

    gazetteers: Tuple[Tuple[str, Tuple[str, ...]], ...]  # (type, terms)

    def tag(self, tokens: pd.Series) -> pd.Series:
        lowered = tokens.str.lower()
        out = pd.Series(["O"] * len(tokens), index=tokens.index)
        for span_type, terms in self.gazetteers:
            out = out.mask(lowered.isin(set(terms)), "B-" + span_type)
        return out


def tag_tokens_batched(tokens: DataFrame, model: GazetteerTagger) -> DataFrame:
    """Batched BIO tagging via mapInPandas; emits (.., bio_tag)."""
    from pyspark.sql.types import StringType, StructField, StructType

    spark = tokens.sparkSession
    bc = spark.sparkContext.broadcast(model)
    in_cols = [f.name for f in tokens.schema.fields]
    out_schema = StructType(
        list(tokens.schema.fields) + [StructField("bio_tag", StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = _cached_model(bc)
        for batch in batches:
            out = batch[in_cols].copy()
            out["bio_tag"] = m.tag(batch["token"])
            yield out

    return tokens.mapInPandas(run, out_schema)

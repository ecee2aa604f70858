"""Corpus-level operators: splits, provenance filters, unions.

`deterministic_split` replaces the reference's seedless per-instance
Bernoulli split (dere/corpus.py:133-155) with a content-derived split:
bucket = md5(doc_id) as a uniform [0,1) value. Unlike ``randomSplit`` this
is reproducible across engines, sessions, parallelism levels AND cluster
sizes — a requirement the moment training jobs resume from checkpoints.
(The reference's cross-reference-preserving deep copy is unnecessary here:
DataFrames are immutable views, so a "split" is just two filters.)
"""

from __future__ import annotations

from typing import Tuple

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def md5_prefix_long(col: Column) -> Column:
    """First 32 md5 bits of a key column as a non-negative long — THE
    content-derived hash every bucketing operator shares (splits,
    mixture sampling, shard packing). Engine-portable: DuckDB spells it
    ('0x'||substr(md5(k),1,8))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def split_bucket(col: Column) -> Column:
    """Uniform [0,1) value from md5 of a key column (engine-portable:
    DuckDB spells it ('0x'||substr(md5(k),1,8))::BIGINT / 2^32)."""
    return md5_prefix_long(col).cast("double") / F.lit(float(2 ** 32))


def deterministic_split(
    df: DataFrame, ratio: float, key: str = "doc_id"
) -> Tuple[DataFrame, DataFrame]:
    """(train, dev) split: rows with bucket(key) < ratio go left."""
    b = split_bucket(F.col(key))
    return df.where(b < ratio), df.where(b >= ratio)


def weighted_sample(
    df: DataFrame,
    fractions: "dict[str, float]",
    group_col: str = "lang",
    key: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-group Bernoulli sampling — corpus MIXTURE
    weights (the Pile/Dolma source-mixing step: sample each source/
    language/quality bucket at its own rate before training).

    A row in group ``g`` survives iff md5(seed|key) as a uniform [0,1)
    value is below ``fractions[g]``; groups absent from ``fractions``
    are dropped entirely (a mixture is an explicit allowlist). Content-
    derived buckets make the draw reproducible across engines, sessions,
    parallelism levels and cluster sizes — ``DataFrame.sample`` is only
    partition-stable — and different seeds draw independent samples.
    Pure map-side filter: the fraction table ships as a CASE literal,
    no join, no shuffle. Fractions must be in [0, 1]; upsampling
    (fraction > 1) is a different operator (explode over a repeat
    count), deliberately not hidden behind the same name."""
    for g, f in fractions.items():
        if not 0.0 <= float(f) <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0,1], got {f}")
    frac = F.lit(None).cast("double")
    for g, f in sorted(fractions.items()):
        frac = F.when(F.col(group_col) == g, F.lit(float(f))).otherwise(frac)
    b = split_bucket(
        F.concat_ws("|", F.lit(str(seed)), F.col(key).cast("string"))
    )
    return df.where(b < frac)


def seeded_shuffle(df: DataFrame, seed: int, key: str = "doc_id") -> DataFrame:
    """Deterministic 'random' ordering — O2, the reference's fixed-seed
    Fisher-Yates before fitting (span_classifier.py:59-67,
    slot_classifier.py:56-57). Ordering by md5(seed || key) is stable
    across sessions, engines and parallelism levels (rand(seed) is only
    partition-stable), with the key as total tie-break."""
    return df.orderBy(
        F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(key).cast("string"))),
        F.col(key),
    )

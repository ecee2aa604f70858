"""Skew-handling utilities: salted joins and salted aggregation.

Web corpora are Zipfian everywhere — entity mentions, hosts, shingles. AQE
skew-join splitting (enabled session-wide) covers sort-merge joins; these
helpers cover the patterns AQE doesn't:

  * `salted_dim_join` — joining a huge fact table to a dimension where a
    few keys dominate: the dimension is exploded ×S (still tiny), the fact
    side gets a deterministic salt derived from a secondary column, so one
    hot key spreads over S reducers. Deterministic (hash, not rand()) so
    outputs are stable across retries and parallelism levels.
  * `salted_count` — two-phase aggregation (partial on (key, salt), final
    on key). Spark's hash aggregation already does map-side partials, so
    this is only for pathological single-key reducers (e.g. top-1 entity
    holding >1 partition's worth of rows).
"""

from __future__ import annotations

from typing import List

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_salt(df: DataFrame, from_cols: List[str], buckets: int, col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from a hash of `from_cols`."""
    return df.withColumn(col, F.pmod(F.hash(*from_cols), F.lit(buckets)))


def salted_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: List[str],
    buckets: int = 16,
    how: str = "left",
) -> DataFrame:
    """fact ⋈ dim on `key`, with the hot-key shuffle spread over `buckets`.

    dim is exploded ×buckets (use only for genuinely small dimensions);
    fact's salt comes from `salt_from` columns so rows of one hot key
    distribute uniformly.
    """
    salted_fact = with_salt(fact, salt_from, buckets)
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count(df: DataFrame, key: str, salt_from: List[str], buckets: int = 16) -> DataFrame:
    """Two-phase count per key: partial on (key, salt), final on key."""
    partial = (
        with_salt(df, salt_from, buckets)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))

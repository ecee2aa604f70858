"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Implementation lives in the ``dere_spark`` package.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dere_spark.queries import ordered_oracles, ordered_queries
from dere_spark.webtext import extract_triples


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: webtext KG construction — documents at sf0.001 ->
    entity-linked (subj, pred, obj) triples."""
    return extract_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Order is the curated DRIVER_WINDOW (dere_spark/queries.py): the driver's
    CORRECTNESS artifact caps at the first 50 entries, so the 50-slot window
    is an explicit, documented choice rather than registration-order
    happenstance. The trailing rotated-out gates (19 from r6 on: 69
    registered - 50 slots) stay registered and are oracle-checked by the
    local harness."""
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (same column
    names/types; order-insensitive). Keys missing here get rows-only checks."""
    return ordered_oracles()

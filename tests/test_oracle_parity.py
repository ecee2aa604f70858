"""Every registered query must match its DuckDB oracle at sf0.001 —
a faster local version of the driver's sf0.01 correctness gate."""

from __future__ import annotations

import pytest

from dere_spark.queries import ORACLES, QUERIES
from tests.oracle_harness import compare, duckdb_conn


@pytest.fixture(scope="module")
def conn(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, conn, sf_dir, name):
    problems = compare(spark, conn, QUERIES[name], ORACLES[name], sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # every registered query is oracle-checked since r2 (porter got a
    # recorded-stems fixture oracle); keep it that way
    assert not missing, f"queries missing oracles: {missing}"

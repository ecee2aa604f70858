"""Local replica of the driver's correctness gate: run a registered query
in Spark and its oracle SQL in DuckDB over the same parquet tables, then
compare row count + column names + order-insensitive values.

Values are normalized before comparison (floats rounded, NaN/None unified,
rows sorted) — the driver's value-hash compare sorts columns by name, so a
query passing here should pass the real gate.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return conn


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v)
    except ImportError:
        pass
    return v

def _norm_rows(cols: List[str], rows) -> Tuple[List[str], List[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def compare(spark, conn, query_fn, oracle: str, sf_dir: str) -> List[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = conn.sql(oracle)
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]

    problems: List[str] = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    _, sn = _norm_rows(s_cols, s_rows)
    _, dn = _norm_rows(d_cols, d_rows)
    if sn != dn:
        diff_s = [r for r in sn if r not in set(dn)][:3]
        diff_d = [r for r in dn if r not in set(sn)][:3]
        problems.append(f"values differ; spark-only≈{diff_s} duckdb-only≈{diff_d}")
    return problems

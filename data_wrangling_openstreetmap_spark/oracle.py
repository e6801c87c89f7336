"""Local replica of the driver's DuckDB oracle comparison.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB (views named after the tables), then
compares row-count + schema + order-insensitive value-hash. This module
reproduces that check locally (strictly: exact canonical values, not a
hash) so mismatches are caught in-repo before a round is graded.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math
from typing import Any

import duckdb

from .io import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir.rstrip('/')}/{t}.parquet')"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    return cols, rows


def _canon_value(v: Any) -> Any:
    """Canonicalize a cell so Spark- and DuckDB-collected values compare
    exactly: Decimals numerically (scale differences between engines'
    result-type rules must not matter), floats bit-for-bit, temporals by
    ISO string, arrays element-wise."""
    if v is None:
        return ("_null", "")
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, _dec.Decimal):
        return ("n", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("n", str(_dec.Decimal(v).normalize()))
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_canon_value(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _canon_value(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v).hex())
    return ("s", str(v))


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Order-insensitive canonical form: columns sorted by name, rows as
    a sorted multiset of canonicalized tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_value(row[i]) for i in order) for row in rows)


def compare(
    spark_cols: list[str],
    spark_rows: list[tuple],
    oracle_cols: list[str],
    oracle_rows: list[tuple],
) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    if len(spark_rows) != len(oracle_rows):
        problems.append(f"row count: spark={len(spark_rows)} oracle={len(oracle_rows)}")
    if sorted(spark_cols) != sorted(oracle_cols):
        problems.append(f"columns: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
        return problems
    a = canonical_rows(spark_cols, spark_rows)
    b = canonical_rows(oracle_cols, oracle_rows)
    if a != b:
        diff_idx = next(
            (i for i, (x, y) in enumerate(zip(a, b)) if x != y), min(len(a), len(b)) - 1
        )
        problems.append(
            f"values differ; first differing sorted row #{diff_idx}:\n"
            f"  spark : {a[diff_idx] if diff_idx < len(a) else '<missing>'}\n"
            f"  oracle: {b[diff_idx] if diff_idx < len(b) else '<missing>'}"
        )
    return problems

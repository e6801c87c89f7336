"""Shared Column-expression helpers for oracle-deterministic queries.

Why decimals (measured, SURVEY.md §7 hazard 2): every money-ish double
column in the testdata is an exact 2-decimal value, so products like
``price * (1-disc) * (1+tax)`` are exact scale-6 decimals — which are
true rounding *ties* at lower scales, and Spark (HALF_UP on the shortest
decimal repr) and DuckDB (round on the binary value) disagree on ~0.6%
of rows if you cast the double product. Casting each *factor* to
DECIMAL(12,2) first is lossless and tie-free (a 2-decimal value is never
a midpoint at scale 2), and all downstream decimal arithmetic is exact,
so aggregates are bit-identical on both engines regardless of partition
order — the property the value-hash needs, at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Lossless decimal type for the 2-decimal money/measure doubles.
MONEY = "decimal(12,2)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def money(col: Column | str) -> Column:
    """Exact decimal image of a 2-decimal double column."""
    return _c(col).cast(MONEY)


def dsum(col: Column | str, out: str = "decimal(38,2)") -> Column:
    """Order-independent SUM of a 2-decimal double column (exact)."""
    return F.sum(money(col)).cast(out)


def dsum_expr(expr: Column, out: str) -> Column:
    """SUM of an already-exact decimal expression, cast so the Spark and
    DuckDB result types (precision, scale) line up."""
    return F.sum(expr).cast(out)


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum → double ÷ count. Both
    engines convert the identical decimal to the identical nearest
    double, then divide by the identical count."""
    c = _c(col)
    return dsum(c).cast("double") / F.count(c)


def oracle_money(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(12,2))"


def oracle_dsum(expr: str, out: str = "DECIMAL(38,2)") -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS {out})"


def oracle_dsum_expr(expr: str, out: str) -> str:
    return f"CAST(SUM({expr}) AS {out})"


def oracle_davg(expr: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE) / COUNT({expr})"
    )

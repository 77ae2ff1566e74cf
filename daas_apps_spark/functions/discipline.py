"""Oracle-determinism helpers (FIXTURES.md canonicalization rules).

Float sums depend on reduction order, which Spark does not fix across
partitionings — and neither does DuckDB. Both engines' DECIMAL addition is
exact and associative, so every monetary aggregate is computed as
``CAST(SUM(CAST(expr AS DECIMAL(18, s))) AS DOUBLE)``: the decimal sum is
order-independent and the final double conversion is IEEE-defined, giving
bit-identical results on both engines at any partition count.

Scale choice: the fixture monetary columns carry 2 decimal digits, so products
of two such columns are exact at scale 4 and of three at scale 6 — casting at
(or above) the exact scale means no rounding ever happens and the HALF_UP
(Spark) vs HALF_EVEN (DuckDB) divergence never triggers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM of a double expression, returned as double."""
    return F.sum(_c(col).cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum / count, double division."""
    c = _c(col)
    return dsum(c, scale) / F.count(c)


def sql_dsum(expr: str, scale: int = 4) -> str:
    """DuckDB twin of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 4) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"{sql_dsum(expr, scale)} / COUNT({expr})"


def r4(col: Column | str) -> Column:
    """ROUND(x, 4) — for non-additive float results (stddev, corr, ratios)."""
    return F.round(_c(col), 4)

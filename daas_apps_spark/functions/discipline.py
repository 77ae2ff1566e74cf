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

Physical strategy: after the decimal cast fixes the rounding, Spark-side
summation runs on SCALED 64-BIT LONGS (x·10^s) instead of 128-bit decimals —
~2× faster through whole-stage codegen, and bit-identical: the long sum and
the decimal sum represent the same exact rational, and both final
conversions to double (IEEE division by 10^s vs BigDecimal.doubleValue) are
correctly rounded. Validity bound: Σ|x|·10^s < 2^63, i.e. ~9·10^14 in
currency units at scale 4 — five orders of magnitude above the sf0.1 bench
totals. Beyond that (≳10^12 rows of monetary data in ONE aggregation group)
use :func:`dsum_wide`, which keeps Spark's overflow-safe decimal(28,s)
accumulator; SCALING.md §3 records the rule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM of a double expression, returned as double."""
    scaled = (_c(col).cast(f"decimal(18,{scale})") * (10**scale)).cast("long")
    return F.sum(scaled) / F.lit(float(10**scale))


def dsum_wide(col: Column | str, scale: int = 4) -> Column:
    """Overflow-safe variant of :func:`dsum` (decimal accumulator) for
    aggregation groups whose scaled totals could exceed 2^63."""
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

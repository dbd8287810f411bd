"""Deterministic ("exact") numeric aggregation builders.

Floating-point sums are order-dependent, and Spark's partial aggregation
order varies with partitioning — verified in-session: the same double sum
differs between partition layouts, so a raw ``F.sum(double)`` can never
hash-match a DuckDB oracle reliably. The fix used throughout the engine:
cast each addend to a decimal with fixed scale (exact, deterministic
per-row), sum decimals (exact integer arithmetic, order-independent), and
cast the final value back to double (correctly rounded, identical in both
engines — verified stable under repartitioning).

At 100 TB this matters beyond testing: decimal sums make partial/final
aggregation results reproducible across runs and cluster layouts, which the
reference achieved trivially by being single-threaded per query.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, prec: int = 18, scale: int = 6) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(_c(col).cast(f"decimal({prec},{scale})")).cast("double")


def davg(col: Column | str, prec: int = 18, scale: int = 6) -> Column:
    """Deterministic mean: exact decimal sum, single IEEE division."""
    c = _c(col)
    return dsum(c, prec, scale) / F.count(c)


def dsum_sq(col: Column | str) -> Column:
    """Exact sum of squares (second zero-moment), as double."""
    c = _c(col)
    return F.sum((c * c).cast("decimal(28,10)")).cast("double")


# Oracle-side SQL fragments mirroring the builders above. Keeping them next
# to the Spark implementations makes the paired semantics reviewable in one
# place.
def sql_dsum(expr: str, prec: int = 18, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, prec: int = 18, scale: int = 6) -> str:
    return f"({sql_dsum(expr, prec, scale)} / COUNT({expr}))"


def sql_dsum_sq(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) * ({expr}) AS DECIMAL(28,10))) AS DOUBLE)"

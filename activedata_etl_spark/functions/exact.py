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
    """Exact sum of squares (second zero-moment), as double.

    The FACTOR is cast to decimal and squared IN DECIMAL (exact int
    arithmetic, engine-identical) — never the double product: casting
    the product double to a scale-10 decimal is tie-exposed once
    |x| > ~3·10³, because the double's ≤17-digit shortest repr no
    longer determines the scale-10 rounding and Spark (repr HALF_UP)
    vs DuckDB (binary expansion) disagree — found by the r5 tie
    fuzzer's second falsifying example (x = 99999.9). Same factor-wise
    form the moment queries (events_value_zscore, agg_corr_covar)
    already use; the close goes through a string for one correctly-
    rounded conversion (see the sql_ fragment note below)."""
    d = _c(col).cast("decimal(18,6)")
    return F.sum(d * d).cast("string").cast("double")


# Oracle-side SQL fragments mirroring the builders above. Keeping them next
# to the Spark implementations makes the paired semantics reviewable in one
# place.
#
# The decimal→double close goes THROUGH AN EXACT STRING: once the sum's
# scaled integer exceeds 2^53, DuckDB's direct decimal→double DOUBLE-
# ROUNDS (int→double, then /10^scale) while Spark's BigDecimal route
# rounds once — the r5 tie fuzzer's first falsifying example was exactly
# this (Σx² = 9999800002 at scale 10 → DuckDB 9999800002.000002, Spark
# 9999800002.0). Via VARCHAR both engines do one correctly-rounded
# strtod; below 2^53 the string route is value-identical to the direct
# cast, so every previously-green oracle is unchanged.
def sql_dsum(expr: str, prec: int = 18, scale: int = 6) -> str:
    return (f"CAST(CAST(SUM(CAST({expr} AS DECIMAL({prec},{scale})))"
            f" AS VARCHAR) AS DOUBLE)")


def sql_davg(expr: str, prec: int = 18, scale: int = 6) -> str:
    return f"({sql_dsum(expr, prec, scale)} / COUNT({expr}))"


def sql_dsum_sq(expr: str) -> str:
    # (19,6) forces DuckDB into int128 multiplication (its 18-digit
    # decimals multiply in int64 and overflow); values match Spark's
    # (18,6)×(18,6)→(37,12) exactly.
    return (f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(19,6))"
            f" * CAST({expr} AS DECIMAL(19,6)))"
            f" AS VARCHAR) AS DOUBLE)")

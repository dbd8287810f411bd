"""Differential fuzzing of the decimal-exact moment substrate
(VERDICT r4 #8 — the centroid-tie bug class, made a permanent
regression test).

Background (NOTES_r4): a double→decimal cast is deterministic across
engines ONLY when the value never lands exactly on a rounding tie at
the target scale. Spark casts through the double's SHORTEST DECIMAL
REPRESENTATION (BigDecimal.valueOf → HALF_UP), so a value whose
shortest repr is e.g. ``999999.0000005`` hits an EXACT tie at scale 6;
DuckDB rounds the binary expansion, which sits off the tie — measured
divergence this session: Spark → 999999.000001, DuckDB →
999999.000000. The engine's contract therefore restricts the
decimal-sum pattern (functions/exact.py) to inputs whose shortest repr
has ≤ scale fractional digits — the cast is then EXACT (no rounding,
so no tie rule can fire), which these fuzzers pin:

1. the supported class really is cast-exact, engine-independent, and
   permutation-invariant through the whole moment machinery (dsum /
   davg / dsum_sq / the factor-wise decimal product sums with the
   string-route decimal→double close — agg_corr_covar's substrate);
2. the FLOOR-QUANTIZE escape hatch (the centroid fix: sum
   floor(x·10^k) as exact bigints, one IEEE division at the end) is
   engine-identical for ARBITRARY doubles — floor has no tie rule, so
   no input restriction at all.
"""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from activedata_etl_spark.functions.exact import (
    dsum, dsum_sq, sql_dsum, sql_dsum_sq,
)

# (group, numerator, frac_digits): value = n / 10^k — shortest decimal
# repr has ≤ k ≤ 6 fractional digits and ≤ 15 significant digits, so
# the double round-trips the decimal exactly (the supported class).
SHORT_DECIMALS = st.tuples(
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=-(10 ** 10), max_value=10 ** 10),
    st.integers(min_value=0, max_value=6),
)


def _mk(spark, rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g INT, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    df = spark.createDataFrame(rows, "g: int, x: double, y: double")
    return df, con


@settings(max_examples=15, deadline=None)
@given(st.lists(SHORT_DECIMALS, min_size=2, max_size=40))
def test_moment_substrate_exact_on_supported_class(spark, triples):
    # x: |x| < 1e5 so x² fits the (28,10)/(37,12) product widths;
    # y: integer-valued up to 1e10 so Σy's scale-6 units blow past 2^53
    # and the decimal→double close exercises the string route (the
    # regime where a direct DuckDB cast double-rounds — caught by this
    # fuzzer's first run, fixed in sql_dsum/sql_dsum_sq).
    rows = [(g, (n % (10 ** 5 * 10 ** k)) / 10 ** k, float(n))
            for g, n, k in triples]
    df, con = _mk(spark, rows)
    agg = [
        F.count(F.lit(1)).alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum_sq("x").alias("sxx_sq"),
        # agg_corr_covar's factor-wise decimal product + string-route
        # decimal→double close (sums exceed 2^53 in scale-12 units)
        F.sum(F.col("x").cast("decimal(18,6)")
              * F.col("x").cast("decimal(18,6)"))
         .cast("string").cast("double").alias("sxx_prod"),
    ]

    def snap(frame):
        return {r["g"]: (r["n"], repr(r["sx"]), repr(r["sy"]),
                         repr(r["sxx_sq"]), repr(r["sxx_prod"]))
                for r in frame.groupBy("g").agg(*agg).collect()}

    got = snap(df)
    # partition layout must not change a single bit
    assert got == snap(df.repartition(13))
    want = {row[0]: (row[1], repr(row[2]), repr(row[3]), repr(row[4]),
                     repr(row[5]))
            for row in con.execute(f"""
        SELECT g, COUNT(*), {sql_dsum('x')}, {sql_dsum('y')},
               {sql_dsum_sq('x')},
               CAST(CAST(SUM(CAST(x AS DECIMAL(19,6))
                             * CAST(x AS DECIMAL(19,6))) AS VARCHAR)
                    AS DOUBLE)
        FROM t GROUP BY g""").fetchall()}
    assert got == want


ANY_DOUBLES = st.tuples(
    st.integers(min_value=0, max_value=2),
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False),
)


@settings(max_examples=15, deadline=None)
@given(st.lists(ANY_DOUBLES, min_size=2, max_size=40))
def test_floor_quantize_engine_identical_on_any_double(spark, pairs):
    """The centroid-fix pattern: floor(x·10^9) summed as exact bigints —
    floor of an IEEE product has NO tie rule, so this is bit-identical
    across engines for arbitrary doubles, unlike the rounding cast."""
    rows = [(g, x, 0.0) for g, x in pairs]
    df, con = _mk(spark, rows)
    got = {r["g"]: r["q"] for r in df.groupBy("g").agg(
        F.sum(F.floor(F.col("x") * 1e9).cast("bigint")).alias("q")).collect()}
    want = dict(con.execute(
        "SELECT g, SUM(CAST(FLOOR(x * 1e9) AS BIGINT)) FROM t GROUP BY g"
    ).fetchall())
    assert got == want


def test_tie_values_are_out_of_contract(spark):
    """Pin the measured hazard that motivates the input restriction: an
    exact-tie shortest repr (999999.0000005 at scale 6) may legally
    round EITHER way depending on engine — each engine lands on one of
    the two adjacent representable decimals, and this session's
    measurement had them DISAGREE (Spark HALF_UP up, DuckDB binary
    down). Anything feeding such derived doubles into a decimal cast
    must floor-quantize instead (NOTES_r4 lesson)."""
    from decimal import Decimal

    tie = 999999.0000005
    lo, hi = Decimal("999999.000000"), Decimal("999999.000001")
    s = spark.createDataFrame([(tie,)], "x: double").select(
        F.col("x").cast("decimal(18,6)").alias("d")).first()["d"]
    d = duckdb.connect().execute(
        "SELECT CAST(? AS DECIMAL(18,6))", [tie]).fetchone()[0]
    assert s in (lo, hi) and d in (lo, hi)

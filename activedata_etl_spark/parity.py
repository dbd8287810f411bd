"""Differential-test harness: Spark query vs DuckDB oracle.

Replicates the verify driver's check locally (row count + column names +
order-insensitive exact value comparison) so every registered pair is
validated before the driver ever sees it. Stricter than the driver in one
way: values must compare equal (``==``) after canonicalization — no float
tolerance — so any pass here implies any sane hash also matches.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from dataclasses import dataclass, field

import duckdb

from pyspark.sql import DataFrame, SparkSession


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the driver's pre-registered view names."""
    from .io import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, _dt.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if hasattr(v, "asDict"):  # pyspark Row (struct) ≙ duckdb dict
        return _canon(v.asDict())
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    if v is None:
        return ("n", "")
    return ("s", str(v))


def canonical_rows(colnames: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver behavior), canonicalize, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int | None
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "FAIL"
        extra = "" if self.ok else " :: " + "; ".join(self.mismatches[:4])
        return f"[{status}] {self.name} (spark={self.spark_rows}, oracle={self.oracle_rows}){extra}"


def compare(name: str, sdf: DataFrame, oracle: str | None,
            con: duckdb.DuckDBPyConnection) -> ParityResult:
    # The verify driver canonicalizes with pandas.sort_values over every
    # column, which raises "unhashable type: 'list'" on array/map/struct
    # outputs (seen in CORRECTNESS_r01). Reject them here so no registered
    # query ever ships a driver-unhashable column — serialize to a string
    # or explode to rows instead.
    bad = [f.name for f in sdf.schema.fields
           if f.dataType.typeName() in ("array", "map", "struct")]
    if bad:
        return ParityResult(
            name, False, -1, None,
            [f"driver-unhashable output columns (array/map/struct): {bad}"])
    collected = sdf.collect()
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in collected]
    if oracle is None:
        return ParityResult(name, len(s_rows) >= 0, len(s_rows), None,
                            ["rows-only check"] if not s_rows else [])
    # DuckDB types SUM over integers (incl. window SUM) as HUGEINT; the
    # verify driver's pandas canonicalizer has no int128 dtype, so a
    # HUGEINT oracle column hash-mismatches even when every value is
    # identical (CORRECTNESS_r02's only two fails). Reject at registration
    # time: the oracle must CAST(... AS BIGINT).
    desc = con.execute(f"DESCRIBE SELECT * FROM ({oracle})").fetchall()
    huge = [r[0] for r in desc if "HUGEINT" in str(r[1]).upper()]
    if huge:
        return ParityResult(
            name, False, -1, None,
            [f"driver-lossy HUGEINT oracle columns (CAST AS BIGINT): {huge}"])
    cur = con.execute(oracle)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()

    mism: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        mism.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        mism.append(f"row count: spark={len(s_rows)} duck={len(d_rows)}")
    if not mism:
        cs, cd = canonical_rows(s_cols, s_rows), canonical_rows(d_cols, d_rows)
        if cs != cd:
            diffs = [i for i, (a, b) in enumerate(zip(cs, cd)) if a != b][:3]
            for i in diffs:
                mism.append(f"row[{i}] spark={cs[i]} duck={cd[i]}")
            if not diffs:
                mism.append("row sets differ")
    return ParityResult(name, not mism, len(s_rows), len(d_rows), mism)


def run_all(spark: SparkSession, sf_dir: str,
            only: list[str] | None = None) -> list[ParityResult]:
    from .queries import ORACLES, QUERIES

    con = duck_connect(sf_dir)
    results = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            results.append(compare(name, fn(spark, sf_dir), ORACLES.get(name), con))
        except Exception as e:  # keep the sweep going; surface the error
            results.append(ParityResult(name, False, -1, None,
                                        [f"{type(e).__name__}: {e}"]))
    return results

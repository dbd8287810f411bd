"""Edge-domain [Q] pairs — SURVEY.md §2.5: dense cubes over set/range/time
domains (cells exist even when empty; count→0, other aggregates→NULL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.exact import dsum, sql_dsum
from ..io import load_table
from ..operators import domains as D
from .registry import query


@query(
    "edges_set_dense",
    oracle=f"""
    SELECT d.o_orderstatus,
           COALESCE(a.n, 0) AS n,
           a.sum_price      AS sum_price
    FROM (VALUES ('O'), ('F'), ('P'), ('X')) AS d(o_orderstatus)
    LEFT JOIN (
      SELECT o_orderstatus, COUNT(*) AS n, {sql_dsum('o_totalprice')} AS sum_price
      FROM orders GROUP BY o_orderstatus
    ) a USING (o_orderstatus)
    """,
)
def edges_set_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set domain with an intentionally-empty part ('X'): the dense cube
    still emits its cell with count 0 / sum NULL."""
    o = load_table(spark, sf_dir, "orders")
    return D.edges_set(
        o, spark, "o_orderstatus", ["O", "F", "P", "X"],
        aggs={"n": F.count(F.lit(1)), "sum_price": dsum("o_totalprice")},
        zero_fill=["n"],
    )


@query(
    "edges_range_histogram",
    oracle="""
    SELECT CAST(d.bucket AS DOUBLE) AS bucket,
           COALESCE(a.n, 0) AS n
    FROM (SELECT unnest(range(0, 600000, 50000)) AS bucket) d
    LEFT JOIN (
      SELECT floor(o_totalprice / 50000) * 50000 AS bucket, COUNT(*) AS n
      FROM orders WHERE o_totalprice >= 0 AND o_totalprice < 600000
      GROUP BY 1
    ) a ON CAST(d.bucket AS DOUBLE) = a.bucket
    """,
)
def edges_range_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return D.edges_range(
        o, spark, F.col("o_totalprice"), "bucket",
        lo=0, hi=600000, interval=50000,
        aggs={"n": F.count(F.lit(1))},
        zero_fill=["n"],
    )


@query(
    "edges_duration_latency",
    oracle="""
    SELECT CAST(d.lat_bucket_s AS BIGINT) AS lat_bucket_s,
           COALESCE(a.n, 0) AS n,
           a.sum_qty        AS sum_qty
    FROM (SELECT unnest(range(0, 10886400, 604800)) AS lat_bucket_s) d
    LEFT JOIN (
      SELECT (datediff('day', o_orderdate, l_shipdate) * 86400 // 604800) * 604800 AS b,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE datediff('day', o_orderdate, l_shipdate) * 86400 >= 0
        AND datediff('day', o_orderdate, l_shipdate) * 86400 < 10886400
      GROUP BY 1
    ) a ON CAST(d.lat_bucket_s AS BIGINT) = a.b
    """,
)
def edges_duration_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration domain (jx_base/domains.py DurationDomain): order→ship
    latency in seconds, dense weekly bins over [0, 18 weeks) — every bin
    appears even if no lineitem landed in it. The latency itself is
    ETL-style enrichment: lineitem joined to its order."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    lat = F.datediff("l_shipdate", "o_orderdate").cast("bigint") * 86400
    return D.edges_duration(
        j, spark, lat, "lat_bucket_s",
        lo=0, hi="18 week", interval="1 week",
        aggs={"n": F.count(F.lit(1)),
              "sum_qty": F.sum(F.col("l_quantity").cast("bigint"))},
        zero_fill=["n"],
    )


@query(
    "edges_time_months",
    oracle=f"""
    SELECT d.mon,
           COALESCE(a.n, 0) AS n,
           a.sum_price      AS sum_price
    FROM (
      SELECT unnest(generate_series(
        (SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS TIMESTAMP) FROM orders),
        (SELECT CAST(date_trunc('month', MAX(o_orderdate)) AS TIMESTAMP) FROM orders),
        INTERVAL 1 MONTH)) AS mon
    ) d
    LEFT JOIN (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
             COUNT(*) AS n, {sql_dsum('o_totalprice')} AS sum_price
      FROM orders GROUP BY 1
    ) a USING (mon)
    """,
)
def edges_time_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month time domain spanning the data, dense over empty
    months — the reference's date_histogram-with-min_doc_count=0."""
    o = load_table(spark, sf_dir, "orders")
    return D.edges_time_months(
        o, F.col("o_orderdate"), "mon",
        aggs={"n": F.count(F.lit(1)), "sum_price": dsum("o_totalprice")},
        zero_fill=["n"],
    )

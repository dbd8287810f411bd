"""Window-function [Q] pairs — SURVEY.md §2.6.

Determinism rules: every ordered window uses a TOTAL order (unique
tiebreak), and float window sums go through the decimal pattern because
Spark (sequential frame recompute) and DuckDB (segment tree) add doubles
in different orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import load_table
from ..operators import windows as W
from .registry import query

# unique total order for orders within a customer partition
_ORD = "epoch_ms(o_orderdate) * 1000000 + o_orderkey"


def _ord_col():
    return (F.unix_millis(F.col("o_orderdate").cast("timestamp")) * 1000000
            + F.col("o_orderkey"))


@query(
    "window_ranking",
    oracle=f"""
    SELECT o_orderkey,
           ROW_NUMBER()  OVER (PARTITION BY o_custkey ORDER BY {_ORD}) AS rn,
           RANK()        OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rk,
           DENSE_RANK()  OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drk
    FROM orders
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    by_cust = W.spec(["o_custkey"], [_ord_col()])
    by_prio = W.spec(["o_custkey"], [F.col("o_orderpriority")])
    return o.select(
        "o_orderkey",
        F.row_number().over(by_cust).alias("rn"),
        F.rank().over(by_prio).alias("rk"),
        F.dense_rank().over(by_prio).alias("drk"),
    )


@query(
    "window_lag_lead",
    oracle=f"""
    SELECT o_orderkey,
           LAG(o_orderkey)      OVER (PARTITION BY o_custkey ORDER BY {_ORD}) AS prev_order,
           LEAD(o_orderkey)     OVER (PARTITION BY o_custkey ORDER BY {_ORD}) AS next_order,
           LAG(o_totalprice, 2) OVER (PARTITION BY o_custkey ORDER BY {_ORD}) AS price_2_back,
           date_diff('day',
             LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY {_ORD}),
             o_orderdate) AS days_since_prev
    FROM orders
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The jx ``rows`` op ({"rows": {var: offset}}) — relative row access."""
    o = load_table(spark, sf_dir, "orders")
    w = W.spec(["o_custkey"], [_ord_col()])
    return o.select(
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.lag("o_totalprice", 2).over(w).alias("price_2_back"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
    )


@query(
    "window_running_sum",
    oracle=f"""
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY {_ORD}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY {_ORD}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No frame + sort ⇒ cumulative aggregate (jx running agg)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.running(W.spec(["o_custkey"], [_ord_col()]))
    return o.select(
        "o_orderkey",
        W.dsum_over("o_totalprice", w).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@query(
    "window_sliding_frame",
    oracle=f"""
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY {_ORD}
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_3,
           MIN(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY {_ORD}
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS min_3,
           MAX(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY {_ORD}
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS max_around
    FROM orders
    """,
)
def window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx window ``range {min: -2, max: 0}`` — row-offset sliding frame."""
    o = load_table(spark, sf_dir, "orders")
    base = W.spec(["o_custkey"], [_ord_col()])
    return o.select(
        "o_orderkey",
        W.dsum_over("o_totalprice", W.sliding(base, -2, 0)).alias("sum_3"),
        F.min("o_totalprice").over(W.sliding(base, -2, 0)).alias("min_3"),
        F.max("o_totalprice").over(W.sliding(base, -1, 1)).alias("max_around"),
    )


@query(
    "window_whole_partition",
    oracle="""
    SELECT o_orderkey,
           COUNT(*) OVER (PARTITION BY o_custkey) AS cust_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey) AS DOUBLE) AS cust_spend,
           MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_max,
           o_totalprice = MAX(o_totalprice) OVER (PARTITION BY o_custkey) AS is_biggest
    FROM orders
    """,
)
def window_whole_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No frame, no sort ⇒ whole-partition aggregate broadcast to rows."""
    o = load_table(spark, sf_dir, "orders")
    w = W.spec(["o_custkey"])
    return o.select(
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("cust_orders"),
        W.dsum_over("o_totalprice", w).alias("cust_spend"),
        F.max("o_totalprice").over(w).alias("cust_max"),
        (F.col("o_totalprice") == F.max("o_totalprice").over(w)).alias("is_biggest"),
    )


@query(
    "window_ntile_percent",
    oracle=f"""
    SELECT o_orderkey,
           NTILE(4)       OVER (ORDER BY o_totalprice, o_orderkey) AS quartile,
           PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) AS pct_rank,
           CUME_DIST()    OVER (ORDER BY o_totalprice, o_orderkey) AS cume
    FROM orders
    """,
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.spec([], [F.col("o_totalprice"), F.col("o_orderkey")])
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "window_first_last_value",
    oracle=f"""
    SELECT o_orderkey,
           FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY {_ORD}
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cust_first,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY {_ORD}
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cust_last
    FROM orders
    """,
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.spec(["o_custkey"], [_ord_col()]).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("cust_first"),
        F.last("o_orderkey").over(w).alias("cust_last"),
    )


@query(
    "window_filtered",
    oracle=f"""
    SELECT o_orderkey,
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
             AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey) AS DOUBLE) AS finished_spend,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END)
             OVER (PARTITION BY o_custkey) AS finished_n
    FROM orders
    """,
)
def window_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx window ``where``: only matching rows feed the frame aggregate."""
    o = load_table(spark, sf_dir, "orders")
    w = W.spec(["o_custkey"])
    cond = F.col("o_orderstatus") == "F"
    return o.select(
        "o_orderkey",
        F.sum(F.when(cond, F.col("o_totalprice")).cast("decimal(18,6)"))
        .over(w).cast("double").alias("finished_spend"),
        F.count(F.when(cond, F.lit(1))).over(w).alias("finished_n"),
    )

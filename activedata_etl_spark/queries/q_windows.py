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


_QH_LADDER = " ".join(
    f"WHEN vt < {1 << i} THEN {i}" for i in range(1, 63))


@query(
    "window_qhist_percentile_bounds",
    oracle=f"""
    WITH w AS (
      SELECT event_id, user_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
               AS arr
      FROM events
    ), r AS (
      SELECT event_id, user_id, CAST(len(arr) AS BIGINT) AS n_frame,
             list_sort(arr)[CAST((len(arr) * 19 + 19) // 20 AS BIGINT)]
               AS v95
      FROM w
    ), b AS (
      SELECT event_id, user_id, n_frame,
             CAST(TRUNC(v95) AS BIGINT) AS vt
      FROM r
    ), k AS (
      SELECT event_id, user_id, n_frame, vt,
             CASE WHEN vt <= 0 THEN 0 {_QH_LADDER} ELSE 63 END AS bucket
      FROM b
    )
    SELECT event_id, user_id, n_frame,
           CAST(bucket AS INT) AS p95_bucket,
           CASE WHEN bucket <= 0 THEN NULL
                ELSE CAST(1::BIGINT << (bucket - 1) AS BIGINT) END
             AS p95_lo,
           CASE WHEN bucket <= 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((1::BIGINT << bucket) - 1 AS BIGINT) END
             AS p95_hi,
           (CASE WHEN bucket <= 0 THEN TRUE
                 ELSE vt >= (1::BIGINT << (bucket - 1)) END)
             AND vt <= (CASE WHEN bucket <= 0 THEN 0
                             ELSE (1::BIGINT << bucket) - 1 END)
             AS in_bounds
    FROM k
    """,
)
def window_qhist_percentile_bounds(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Windowed p95 BOUNDS from log-histogram registers
    (operators/windows.qhist_bounds_over, VERDICT r7 #5): the
    bounded-state alternative to the exact collect-the-frame percentile
    — ≤64 bucket counters per row regardless of frame size, so a
    trailing percentile over a million-row frame carries kilobytes of
    state instead of a million-element array per row (the exact path
    keeps its max_frame_rows guard for exactly that reason). Trailing
    50-event frame per user; rank arithmetic is all-BIGINT
    (ceil(0.95·N) = (N·19 + 19) DIV 20).

    The oracle is the EXACT-RANK AUDIT: DuckDB computes the true
    rank-selected order statistic per frame (sorted frame array) and
    buckets it — bucketing is monotone in the truncated value, so the
    register-selected bucket must equal the exact statistic's bucket,
    and the in_bounds flag (exact value within [lo, hi], lo NULL for
    the ≤0 bucket) must be uniformly true. A hash match therefore
    PROVES the envelope claim on every frame in the corpus, not just
    on sampled rows."""
    e = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-49, 0))
    out = W.qhist_bounds_over(e, "value", w, {"p95": (19, 20)})
    rank = F.expr("CAST((n_frame * 19 + 19) DIV 20 AS BIGINT)")
    exact = F.element_at(
        F.array_sort(F.collect_list("value").over(w)), rank.cast("int"))
    vt = exact.cast("bigint")
    return out.select(
        "event_id", "user_id", "n_frame", "p95_bucket", "p95_lo", "p95_hi",
        ((F.col("p95_lo").isNull() | (vt >= F.col("p95_lo")))
         & (vt <= F.col("p95_hi"))).alias("in_bounds"))


@query(
    "window_qhist_trailing_range",
    oracle=f"""
    WITH w AS (
      SELECT event_id, user_id,
             list(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                               RANGE BETWEEN 604800000 PRECEDING
                                         AND CURRENT ROW) AS arr
      FROM events
    ), r AS (
      SELECT event_id, user_id, CAST(len(arr) AS BIGINT) AS n_frame,
             list_sort(arr)[CAST((len(arr) + 1) // 2 AS BIGINT)] AS v50
      FROM w
    ), b AS (
      SELECT event_id, user_id, n_frame,
             CAST(TRUNC(v50) AS BIGINT) AS vt
      FROM r
    ), k AS (
      SELECT event_id, user_id, n_frame, vt,
             CASE WHEN vt <= 0 THEN 0 {_QH_LADDER} ELSE 63 END AS bucket
      FROM b
    )
    SELECT event_id, user_id, n_frame,
           CAST(bucket AS INT) AS p50_bucket,
           CASE WHEN bucket <= 0 THEN NULL
                ELSE CAST(1::BIGINT << (bucket - 1) AS BIGINT) END
             AS p50_lo,
           CASE WHEN bucket <= 0 THEN CAST(0 AS BIGINT)
                ELSE CAST((1::BIGINT << bucket) - 1 AS BIGINT) END
             AS p50_hi
    FROM k
    """,
)
def window_qhist_trailing_range(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """TIME-RANGE-frame form of the register-based windowed percentile
    (operators/windows.qhist_bounds_over over a rangeBetween frame):
    trailing-7-day p50 bounds of event value per user — the rolling
    robust statistic an operational series wants, with ≤64 counters per
    row no matter how many events the week holds (a hot user's week can
    be millions of rows at 100 TB; the exact path would materialize
    them per row). Rank arithmetic all-BIGINT (ceil(N/2) = (N+1) DIV 2).
    The oracle computes the exact rank statistic per frame and buckets
    it — equality is the monotone-truncation argument, checked on every
    frame."""
    e = load_table(spark, sf_dir, "events")
    # MILLISECOND epoch on both sides: Spark's unix_timestamp truncates
    # to seconds while DuckDB's epoch() keeps fractions — a row exactly
    # 7d+0.4s back lands inside one engine's frame and outside the
    # other's (caught by the sf0.1 sweep, one boundary row in 100k)
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_millis("ts"))
         .rangeBetween(-604800000, 0))
    out = W.qhist_bounds_over(e, "value", w, {"p50": (1, 2)})
    return out.select("event_id", "user_id", "n_frame",
                      "p50_bucket", "p50_lo", "p50_hi")

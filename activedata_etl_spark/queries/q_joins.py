"""Join [Q] pairs — SURVEY.md §2.3. jx has no join operator (denormalize-at-
ETL doctrine); these are the enrichment joins the reference does
procedurally, as first-class Spark joins with explicit physical strategy."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.exact import dsum, sql_dsum
from ..io import load_table
from ..operators import joins as J
from .registry import query


@query(
    "join_inner_broadcast",
    oracle=f"""
    SELECT p.p_brand,
           COUNT(*) AS n_lines,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⨝ dim: the reference's dict-lookup enrichment
    (transforms/jobs_to_normalized.py) as a broadcast hash join — the
    lineitem side never shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        J.broadcast_equi(li, p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "join_left_outer",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey)      AS n_orders,
           {sql_dsum('o.o_totalprice')} AS spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice").alias("spend"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@query(
    "join_anti",
    oracle="""
    SELECT p_partkey, p_brand FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts never ordered in bulk (anti join against a filtered fact)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select("p_partkey", "p_brand")


@query(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(cc.c_nationkey, ss.s_nationkey) AS nationkey,
           cc.n_cust, ss.n_supp
    FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) cc
    FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) ss
      ON cc.c_nationkey = ss.s_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"))
    s = load_table(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_supp"))
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            "n_cust", "n_supp",
        )
    )


@query(
    "join_range_containment",
    oracle="""
    SELECT o.o_orderkey, t.tier
    FROM orders o
    JOIN (VALUES ('small', 0, 100000), ('medium', 100000, 250000),
                 ('large', 250000, 1000000)) AS t(tier, lo, hi)
      ON o.o_totalprice >= t.lo AND o.o_totalprice < t.hi
    """,
)
def join_range_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join (the reference's push-date range scans,
    mo_hg revision ranges) — broadcast nested-loop on a tiny dim."""
    o = load_table(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(
        [("small", 0, 100000), ("medium", 100000, 250000), ("large", 250000, 1000000)],
        "tier string, lo long, hi long",
    )
    return J.range_join(
        o, tiers, F.col("o_totalprice"), F.col("lo"), F.col("hi")
    ).select("o_orderkey", "tier")


@query(
    "join_asof",
    oracle="""
    WITH cand AS (
      SELECT e.event_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    )
    SELECT e.event_id, c.o_orderkey AS asof_order
    FROM events e
    LEFT JOIN (SELECT event_id, o_orderkey FROM cand WHERE rn = 1) c USING (event_id)
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest order at-or-before each event's timestamp for the
    event's user (reference: TUID 'latest annotation ≤ revision')."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    out = J.asof_join(
        e, o,
        left_on="user_id", right_on="o_custkey",
        left_time="ts", right_time="o_orderdate",
        tiebreak="o_orderkey", right_cols=["o_orderkey"],
    )
    return out.select("event_id", F.col("o_orderkey").alias("asof_order"))


@query(
    "join_asof_tolerance",
    oracle="""
    WITH clicks AS (
      SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'
    ), buys AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), cand AS (
      SELECT b.event_id, c.click_id,
             ROW_NUMBER() OVER (PARTITION BY b.event_id
                                ORDER BY c.ts DESC, c.click_id DESC) AS rn
      FROM buys b
      JOIN clicks c ON b.user_id = c.user_id
       AND c.ts <= b.ts
       AND c.ts >= b.ts - INTERVAL 2 HOUR
    )
    SELECT b.event_id, x.click_id AS asof_click
    FROM buys b
    LEFT JOIN (SELECT event_id, click_id FROM cand WHERE rn = 1) x USING (event_id)
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with bounded staleness: each purchase attributed to the
    user's latest click, but only within 2 hours — older clicks become
    NULL (the 'quote must be fresh' variant; the attribution-window rule
    of click attribution). Same single-shuffle union plan as join_asof;
    the bound is plain column arithmetic on the carried match time."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"), "user_id", "ts"))
    buys = (ev.filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", F.col("ts").alias("buy_ts")))
    out = J.asof_join(
        buys, clicks,
        left_on="user_id", right_on="user_id",
        left_time="buy_ts", right_time="ts",
        tiebreak="click_id", right_cols=["click_id"],
        tolerance_s=2 * 3600,
    )
    return out.select("event_id", F.col("click_id").alias("asof_click"))


@query(
    "join_asof_forward",
    oracle="""
    WITH cand AS (
      SELECT e.event_id, o.o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
      FROM events e
      JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts
    )
    SELECT e.event_id, c.o_orderkey AS next_order
    FROM events e
    LEFT JOIN (SELECT event_id, o_orderkey FROM cand WHERE rn = 1) c USING (event_id)
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: the earliest order at-or-after each event's
    timestamp ("next deploy after this failure"). Same single-shuffle
    union + carry plan as backward; only the window scan order flips.
    Ties resolve to the smallest key (the backward variant's mirror)."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    out = J.asof_join(
        e, o,
        left_on="user_id", right_on="o_custkey",
        left_time="ts", right_time="o_orderdate",
        tiebreak="o_orderkey", right_cols=["o_orderkey"],
        direction="forward",
    )
    return out.select("event_id", F.col("o_orderkey").alias("next_order"))

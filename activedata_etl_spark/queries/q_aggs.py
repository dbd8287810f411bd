"""Aggregation [Q] pairs — SURVEY.md §2.4 (jx aggregate names, grouping
machinery, cube/rollup, having, distinct)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import aggs as A
from ..functions.exact import davg, dsum, sql_davg, sql_dsum
from ..io import load_table
from .registry import query


@query(
    "agg_groupby_basic",
    oracle=f"""
    SELECT c_nationkey,
           COUNT(c_custkey)            AS n_cust,
           {sql_dsum('c_acctbal')}     AS sum_bal,
           MIN(c_acctbal)              AS min_bal,
           MAX(c_acctbal)              AS max_bal,
           {sql_davg('c_acctbal')}     AS avg_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_groupby_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        A.count_("c_custkey").alias("n_cust"),
        dsum("c_acctbal").alias("sum_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        davg("c_acctbal").alias("avg_bal"),
    )


@query(
    "agg_median_percentile",
    oracle="""
    SELECT l_returnflag,
           percentile_cont(0.5)  WITHIN GROUP (ORDER BY CAST(l_quantity AS DOUBLE)) AS med_qty,
           percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(l_quantity AS DOUBLE)) AS p25_qty,
           percentile_cont(0.9)  WITHIN GROUP (ORDER BY CAST(l_quantity AS DOUBLE)) AS p90_qty,
           percentile_cont(0.5)  WITHIN GROUP (ORDER BY CAST(l_extendedprice AS DOUBLE)) AS med_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed strategy by cardinality: histogram percentiles on the
    ~50-distinct-value quantity column (partial-aggregatable count shuffle),
    bracket-pruned exact percentile on the near-unique price column
    (sketch brackets + scan counts + tiny candidate sort — unlike
    sorted_percentiles' one-task-per-group sort, parallelism doesn't
    collapse to the group count; 7x faster at sf0.1, exact either way),
    joined on the 3-row group key — broadcast, no extra shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = A.histogram_percentiles(li, ["l_returnflag"], "l_quantity",
                                  {"med_qty": 0.5, "p25_qty": 0.25,
                                   "p90_qty": 0.9})
    price = A.pruned_percentiles(li, ["l_returnflag"], "l_extendedprice",
                                 {"med_price": 0.5})
    return qty.join(price, "l_returnflag")


@query(
    "agg_cardinality",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(*)                  AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        A.cardinality("l_suppkey").alias("n_supp"),
        A.cardinality("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_STATS_INNER = A.sql_stats_moments("l_quantity")


@query(
    "agg_stats_zero_moments",
    oracle=f"""
    SELECT l_returnflag, stat_min, stat_max, {", ".join(A.STATS_DERIVED_SQL)}
    FROM (
      SELECT l_returnflag,
             MIN(l_quantity) AS stat_min,
             MAX(l_quantity) AS stat_max,
             {_STATS_INNER}
      FROM lineitem GROUP BY l_returnflag
    )
    """,
)
def agg_stats_zero_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    moments = li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("stat_min"),
        F.max("l_quantity").alias("stat_max"),
        *A.stats_moments("l_quantity"),
    )
    # identical derived-SQL text on both engines → bit-equal doubles
    return moments.selectExpr("l_returnflag", "stat_min", "stat_max", *A.STATS_DERIVED_SQL)


@query(
    "agg_union_set",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list(DISTINCT n_name ORDER BY n_name), '|') AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_union_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    # serialized '|'-joined (sorted) — the driver's canonicalizer can't
    # hash array cells; A.union_ keeps the native array form for library use
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(A.union_("n_name"), "|").alias("nations"))


@query(
    "agg_first_last",
    oracle="""
    SELECT o_custkey,
           arg_min(o_orderkey, epoch_ms(o_orderdate) * 1000000 + o_orderkey) AS first_order,
           arg_max(o_orderkey, epoch_ms(o_orderdate) * 1000000 + o_orderkey) AS last_order,
           arg_min(o_totalprice, epoch_ms(o_orderdate) * 1000000 + o_orderkey) AS first_price
    FROM orders GROUP BY o_custkey
    """,
)
def agg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # encounter order must be explicit under parallelism (§7.5 #7): a
    # globally unique sort key = (orderdate, orderkey) packed into one long.
    ord_ = F.unix_millis(F.col("o_orderdate").cast("timestamp")) * 1000000 + F.col("o_orderkey")
    return o.groupBy("o_custkey").agg(
        A.first_("o_orderkey", ord_).alias("first_order"),
        A.last_("o_orderkey", ord_).alias("last_order"),
        A.first_("o_totalprice", ord_).alias("first_price"),
    )


@query(
    "agg_having",
    oracle=f"""
    SELECT * FROM (
      SELECT c_nationkey, COUNT(*) AS n, {sql_davg('c_acctbal')} AS avg_bal
      FROM customer GROUP BY c_nationkey
    ) WHERE n >= 3 AND avg_bal > 0
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx has no HAVING — post-filter via nested query ({"from": {...},
    "where": ...}); same shape here: agg then filter."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), davg("c_acctbal").alias("avg_bal"))
        .filter((F.col("n") >= 3) & (F.col("avg_bal") > 0))
    )


@query(
    "agg_distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def agg_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT)  AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT)  AS g_status,
           COUNT(*) AS n,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absent in the reference (multi-edge = one N-dim cube, not power-set);
    exposed because Spark gives it free (SURVEY.md §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT)  AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT)  AS g_status,
           COUNT(*) AS n,
           {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("sum_price"),
    )

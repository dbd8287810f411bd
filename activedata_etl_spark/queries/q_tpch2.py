"""Second batch of TPC-H-shaped [Q] pairs — the correlated-subquery heavy
queries (q2/q9/q11/q16/q20/q21/q22), adapted to the fixture schema
(no partsupp; supply relationships derived from distinct lineitem pairs,
see FIXTURES.md). Each exercises a decorrelation shape Spark must plan
well: min-per-group re-join, HAVING vs scalar subquery, NOT IN anti-join,
nested semi-joins, and EXISTS/NOT EXISTS double correlation on one fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.exact import davg, dsum, sql_davg, sql_dsum
from ..io import load_table
from .registry import query


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey FROM lineitem l
    ),
    cand AS (
      SELECT p.p_partkey, p.p_type, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supply sp
      JOIN part p     ON p.p_partkey = sp.l_partkey
      JOIN supplier s ON s.s_suppkey = sp.l_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_size = 15
    )
    SELECT p_partkey, p_type, s_suppkey, s_name, s_acctbal, n_name
    FROM cand c
    WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2
                       WHERE c2.p_partkey = c.p_partkey)
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (s_acctbal standing in for the absent ps_supplycost): pick,
    per part, the cheapest qualifying supplier. The correlated MIN
    decorrelates into a window min over the candidate set — one shuffle on
    p_partkey instead of an aggregate + re-join double scan."""
    supply = (load_table(spark, sf_dir, "lineitem")
              .select("l_partkey", "l_suppkey").distinct())
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        supply.join(F.broadcast(p), supply.l_partkey == p.p_partkey)
        .join(F.broadcast(s), supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("p_partkey", "p_type", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    mn = F.min("s_acctbal").over(Window.partitionBy("p_partkey"))
    return (cand.withColumn("__mn__", mn)
            .filter(F.col("s_acctbal") == F.col("__mn__")).drop("__mn__"))


@query(
    "tpch_q9_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)'
                     ' - 0.1 * p.p_retailprice * l.l_quantity', 28, 10)}
             AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (0.1·p_retailprice stands in for ps_supplycost): profit by
    supplier nation and order year over a LIKE-filtered part slice. The
    LIKE can't prune at the parquet scan, but the filtered part dim is tiny
    → broadcast, so lineitem⨝orders stays the only shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.1 * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit, 28, 10).alias("sum_profit"))
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH natval AS (
      SELECT l.l_partkey, {sql_dsum('l.l_extendedprice')} AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, value FROM natval
    WHERE value > (SELECT 0.00025 * {sql_dsum('value')} FROM natval)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part value within one nation, kept when above a
    fraction of the nation total. The scalar-subquery total is a window sum
    over an empty partition — broadcast of one row, no second scan. Both
    sides of the > are decimal-derived, so the comparison is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    natval = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice").alias("value"))
    )
    total = F.sum(F.col("value").cast("decimal(18,6)")).over(Window.partitionBy()) \
             .cast("double")
    return (natval.withColumn("__tot__", total)
            .filter(F.col("value") > 0.00025 * F.col("__tot__")).drop("__tot__"))


@query(
    "tpch_q16_supplier_relationship",
    oracle="""
    WITH supply AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey FROM lineitem l
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT sp.l_suppkey) AS supplier_cnt
    FROM supply sp JOIN part p ON p.p_partkey = sp.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND sp.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape ('%7'-named suppliers stand in for the complaints NOT IN):
    distinct supplier count per part class, minus an exclusion list. The
    NOT IN is a broadcast anti-join (the exclusion side is provably
    non-null keys, so anti == NOT IN here)."""
    supply = (load_table(spark, sf_dir, "lineitem")
              .select("l_partkey", "l_suppkey").distinct())
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    excl = (load_table(spark, sf_dir, "supplier")
            .filter(F.col("s_name").like("%7")).select("s_suppkey"))
    return (
        supply.join(F.broadcast(excl), supply.l_suppkey == excl.s_suppkey,
                    "left_anti")
        .join(F.broadcast(p), supply.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_part_promotion",
    oracle=f"""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey
        HAVING {sql_dsum('l.l_quantity')} > 200
      )
    """,
)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested IN subqueries — suppliers who moved >50 units of a
    name-slice of parts in 1996, restricted to one nation. Planned inside-
    out: part filter → semi-join lineitem → HAVING aggregate → semi-join
    supplier; every dimension side broadcasts."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    parts = (load_table(spark, sf_dir, "part")
             .filter(F.col("p_name").like("red%")).select("p_partkey"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    movers = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity").alias("q"))
        .filter(F.col("q") > 200)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "tpch_q21_suppliers_kept_waiting",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN li l1 ON l1.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_1'
      AND l1.late
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name
    """,
)
def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (late := shipped >60 days after order; fixtures lack
    commit/receipt dates): the sole late supplier on multi-supplier
    finalized orders. EXISTS + NOT EXISTS over the same fact decorrelate
    into ONE per-order aggregate (supplier count, late-supplier count)
    joined back — two scans instead of the naive four, and the join keys
    all align on l_orderkey so AQE coalesces the exchanges."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = (load_table(spark, sf_dir, "lineitem")
          .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
          .select("l_orderkey", "l_suppkey",
                  (F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")).alias("late")))
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        li.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle=f"""
    WITH pos AS (
      SELECT {sql_davg('c_acctbal')} AS avg_bal FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9)
    )
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           {sql_dsum('c.c_acctbal')} AS totacctbal
    FROM customer c, pos
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9)
      AND c.c_acctbal > pos.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (nationkey stands in for the absent phone prefix):
    well-funded customers per nation who never placed an urgent order
    (every fixture customer has SOME order, so the classic no-orders form
    would be vacuous). Scalar avg subquery → cross-join of a 1-row
    broadcast; NOT EXISTS → anti-join against urgent-order custkeys. davg
    keeps the threshold comparison engine-exact."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9))
    avg_bal = (c.filter(F.col("c_acctbal") > 0.0)
               .agg(davg("c_acctbal").alias("avg_bal")))
    o_keys = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select("o_custkey"))
    return (
        c.join(o_keys, c.c_custkey == o_keys.o_custkey, "left_anti")
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"),
             dsum("c_acctbal").alias("totacctbal"))
    )

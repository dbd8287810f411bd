"""Set-operation and sort/limit/top-k [Q] pairs — SURVEY.md §2.7–2.8."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import load_table
from .registry import query


@query(
    "setop_union_all",
    oracle="""
    SELECT c_custkey AS id, c_name AS name, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey AS id, s_name AS name, 'supplier' AS kind FROM supplier
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ConcatSources (activedata_etl/etl.py) — multiple
    source blocks read as one stream — is a bag union."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("name"),
        F.lit("supplier").alias("kind"))
    return c.unionByName(s)


@query(
    "setop_intersect",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem
    INTERSECT
    SELECT s_suppkey AS suppkey FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("suppkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("suppkey"))
    return li.intersect(s)


@query(
    "setop_except",
    oracle="""
    SELECT p_partkey AS partkey FROM part
    EXCEPT
    SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity >= 40
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("partkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_quantity") >= 40)
          .select(F.col("l_partkey").alias("partkey")))
    return p.exceptAll(li).distinct()


@query(
    "setop_array_values",
    oracle="""
    SELECT n_regionkey,
           COALESCE(array_to_string(list_sort(list_intersect(list(DISTINCT n_name),
                                    ['ALGERIA', 'CHINA', 'FRANCE', 'PERU'])), '|'), '') AS known,
           COALESCE(array_to_string(list_sort(list_filter(list(DISTINCT n_name),
                                 x -> NOT list_contains(['ALGERIA', 'CHINA', 'FRANCE', 'PERU'], x))), '|'), '') AS others
    FROM nation GROUP BY n_regionkey
    """,
)
def setop_array_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-set ops (jx UnionOp on expressions) via array functions;
    '|'-serialized (array cells are driver-unhashable)."""
    n = load_table(spark, sf_dir, "nation")
    probe = F.array(*[F.lit(x) for x in ["ALGERIA", "CHINA", "FRANCE", "PERU"]])
    sets = n.groupBy("n_regionkey").agg(F.collect_set("n_name").alias("names"))
    return sets.select(
        "n_regionkey",
        F.array_join(F.array_sort(F.array_intersect("names", probe)), "|").alias("known"),
        F.array_join(F.array_sort(F.array_except("names", probe)), "|").alias("others"),
    )


@query(
    "sort_multi_key_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 20
    """,
)
def sort_multi_key_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort+limit — Catalyst plans TakeOrderedAndProject (a distributed
    top-k, never a full sort). Total order ⇒ deterministic result set."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(),
                 F.col("l_linenumber").asc())
        .limit(20)
    )


@query(
    "sort_missing_first",
    oracle="""
    SELECT o_orderkey, v FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_totalprice END AS v
      FROM orders
    ) ORDER BY v ASC NULLS FIRST, o_orderkey LIMIT 100
    """,
)
def sort_missing_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx sort semantics: missing values sort FIRST (lowest) —
    vendor/jx_python/jx.py :: sort."""
    o = load_table(spark, sf_dir, "orders")
    v = F.when(F.col("o_orderkey") % 11 == 0, None).otherwise(F.col("o_totalprice"))
    return (
        o.select("o_orderkey", v.alias("v"))
        .orderBy(F.col("v").asc_nulls_first(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "sort_paging",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn > 40 AND rn <= 60
    """,
)
def sort_paging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paging (service-side skip/limit) via row_number filter."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter((F.col("rn") > 40) & (F.col("rn") <= 60))
        .drop("rn")
    )

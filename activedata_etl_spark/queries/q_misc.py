"""Remaining §2 surface: get/tuple/split ops, edges allowNulls overflow
part, jx deep query (from: "table.array")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ext import text as TX
from ..functions import jx
from ..functions.exact import sql_dsum
from ..io import load_table
from ..operators import domains as D
from ..operators import nested as N
from ..plans import query as JXQ
from .registry import query


@query(
    "expr_split_get_tuple",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1]                          AS first_tok,
           string_split(text, ' ')[3]                          AS third_tok,
           len(string_split(text, ' '))                        AS n_parts,
           lang                                                AS pair_lang,
           source                                              AS pair_src
    FROM documents
    """,
)
def expr_split_get_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SplitOp → array, GetOp (dynamic index, 1-based in both engines),
    TupleOp → struct (built, then projected back to scalar fields — the
    driver's canonicalizer can't hash struct cells)."""
    d = load_table(spark, sf_dir, "documents")
    toks = jx.split("text", " ")
    return d.select(
        "doc_id",
        jx.get(toks, 1).alias("first_tok"),
        jx.get(toks, 3).alias("third_tok"),
        F.size(toks).alias("n_parts"),
        F.struct(F.col("lang").alias("lang"), F.col("source").alias("src")).alias("pair"),
    ).select(
        "doc_id", "first_tok", "third_tok", "n_parts",
        F.col("pair.lang").alias("pair_lang"),
        F.col("pair.src").alias("pair_src"),
    )


@query(
    "expr_number_to_string",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity = floor(l_quantity)
                THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
                ELSE CAST(l_quantity AS VARCHAR) END AS qty_str,
           CASE WHEN l_discount = floor(l_discount)
                THEN CAST(CAST(l_discount AS BIGINT) AS VARCHAR)
                ELSE CAST(l_discount AS VARCHAR) END AS disc_str
    FROM lineitem
    """,
)
def expr_number_to_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx string-of-number: whole doubles print as integers ("26", not
    "26.0") — the reference's JSON number rendering."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        jx.number_to_string("l_quantity").alias("qty_str"),
        jx.number_to_string("l_discount").alias("disc_str"),
    )


@query(
    "edges_set_allow_nulls",
    oracle="""
    SELECT d.o_orderstatus, COALESCE(a.n, 0) AS n
    FROM (VALUES ('O'), ('F'), (NULL)) d(o_orderstatus)
    LEFT JOIN (
      SELECT CASE WHEN o_orderstatus IN ('O', 'F') THEN o_orderstatus END AS o_orderstatus,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    ) a ON d.o_orderstatus IS NOT DISTINCT FROM a.o_orderstatus
    """,
)
def edges_set_allow_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """allowNulls: values outside the domain (here status 'P') fall into
    the NULL overflow part — reference decoders' include-missing bucket."""
    o = load_table(spark, sf_dir, "orders")
    return D.edges_set(
        o, spark, "o_orderstatus", ["O", "F"],
        aggs={"n": F.count(F.lit(1))}, zero_fill=["n"], allow_nulls=True,
    )


@query(
    "edges_predicate_parts",
    oracle=f"""
    SELECT d.tier, COALESCE(a.n, 0) AS n, a.revenue
    FROM (VALUES ('vip'), ('big'), ('urgent_small'), ('rest')) d(tier)
    LEFT JOIN (
      SELECT CASE WHEN o_totalprice > 400000 THEN 'vip'
                  WHEN o_totalprice > 250000 THEN 'big'
                  WHEN o_orderpriority = '1-URGENT' THEN 'urgent_small'
                  ELSE 'rest' END AS tier,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    ) a USING (tier)
    """,
)
def edges_predicate_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set domain with PREDICATE partitions ({name, where} parts,
    first-match-wins) + overflow part — the reference's filters-aggs
    decoder (es52/decoders.py)."""
    o = load_table(spark, sf_dir, "orders")
    from ..functions.exact import dsum

    return D.edges_predicate_parts(
        o, spark, "tier",
        parts=[
            ("vip", F.col("o_totalprice") > 400000),
            ("big", F.col("o_totalprice") > 250000),
            ("urgent_small", F.col("o_orderpriority") == "1-URGENT"),
        ],
        aggs={"n": F.count(F.lit(1)), "revenue": dsum("o_totalprice")},
        zero_fill=["n"],
        overflow="rest",
    )


@query(
    "agg_argmax_join_back",
    oracle="""
    SELECT n.n_name,
           arg_max(c.c_name, c.c_acctbal * 1000000 + c.c_custkey) AS richest,
           MAX(c.c_acctbal) AS top_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def agg_argmax_join_back(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Richest customer per nation: arg-max with a unique tiebreak +
    dimension join — the 'top entity per group' shape that usually gets
    written as an expensive self-join; min_by/max_by is one pass."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    ord_ = F.col("c_acctbal") * 1000000 + F.col("c_custkey")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", ord_).alias("richest"),
            F.max("c_acctbal").alias("top_bal"),
        )
    )


@query(
    "text_quality_filter",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             length(text) AS n_chars_computed,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok,
             len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) * 1.0
               / len(string_split_regex(lower(trim(text)), '\\s+')) AS ttr
      FROM documents
    )
    WHERE n_chars_computed >= 100 AND n_tok >= 20 AND ttr >= 0.3
    """,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical corpus-cleaning step: keep documents passing
    length/token/type-token-ratio thresholds — a scan-local filter that
    drops data BEFORE any shuffle in a real pipeline."""
    d = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    ttr = F.size(F.array_distinct(toks)) / F.size(toks)
    return (
        d.filter((F.length("text") >= 100) & (F.size(toks) >= 20) & (ttr >= 0.3))
        .select("doc_id", "lang")
    )


@query(
    "jx_deep_query",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity >= 45
    """,
)
def jx_deep_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep query: {"from": "orders_nested.items"} unnests the child array
    with parent columns in scope (es52/deep.py; child tables in
    jx_sqlite). The nested view is built by the ETL-side nest()."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = N.nest(li, ["l_orderkey"],
                    ["l_linenumber", "l_quantity"], order_by="l_linenumber")
    nested.createOrReplaceTempView("orders_nested")
    return JXQ.run(spark, {
        "from": "orders_nested.items",
        "where": {"gte": ["l_quantity", 45]},
        "select": ["l_orderkey", "l_linenumber", "l_quantity"],
    })


@query(
    "join_salted_skew",
    oracle=f"""
    SELECT o.o_orderpriority,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-mitigation rewrite under the correctness gate: salting
    must be RESULT-invisible — the oracle is the plain join. (The salt
    spreads each hot l_orderkey over 8 buckets; the orders side is
    replicated 8× through the shuffle. Use when AQE skew-join can't fire,
    e.g. the skewed side feeds a hash-table build.)"""
    from ..functions.exact import dsum
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey")
    return (
        salted_join(li, o, "l_orderkey", salt=8)
        .groupBy("o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
    )

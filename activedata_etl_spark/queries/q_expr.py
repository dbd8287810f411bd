"""Scalar expression [Q] pairs — SURVEY.md §2.2 (predicates) + §2.9 (string/
math/date kit), exercising the jx null semantics from §7.5.

The testdata has no NULLs (verified), so null behavior is exercised by
synthesizing missing values with NULLIF/CASE inside each query — the oracle
SQL spells out the identical explicit semantics so we test OUR intended
behavior, not SQL defaults.

Per-row float arithmetic is deterministic IEEE and identical across engines
(only *aggregation order* is not), so projections may output doubles freely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import jx
from ..io import load_table
from .registry import query


@query(
    "expr_null_semantics",
    oracle="""
    SELECT o_orderkey,
           (a IS NOT DISTINCT FROM b)                                    AS eq_ab,
           (a IS NOT NULL AND b IS NOT NULL AND a <> b)                  AS ne_ab,
           CASE WHEN a IS NULL AND b IS NULL THEN NULL
                ELSE COALESCE(a, 0) + COALESCE(b, 0) END                 AS add_ab,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 7) END                 AS div_safe,
           COALESCE(a, b, 0)                                            AS coal,
           (a IS NULL)                                                  AS missing_a,
           (b IS NOT NULL)                                              AS exists_b
    FROM (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS a,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS b
      FROM orders
    )
    """,
)
def expr_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(F.col("o_totalprice"))
    b = F.when(F.col("o_orderkey") % 5 == 0, None).otherwise(F.col("o_totalprice"))
    o = o.select("o_orderkey", "o_totalprice", a.alias("a"), b.alias("b"))
    return o.select(
        "o_orderkey",
        jx.eq("a", "b").alias("eq_ab"),
        jx.ne("a", "b").alias("ne_ab"),
        jx.add("a", "b").alias("add_ab"),
        jx.div("o_totalprice", F.col("o_orderkey") % 7).alias("div_safe"),
        jx.coalesce("a", "b", 0).alias("coal"),
        jx.missing("a").alias("missing_a"),
        jx.exists("b").alias("exists_b"),
    )


@query(
    "expr_string_kit",
    oracle="""
    SELECT p_partkey,
           length(p_name)                                        AS name_len,
           substr(p_name, 1, 5)                                  AS left5,
           substr(p_name, greatest(length(p_name) - 3 + 1, 1), 3) AS right3,
           substr(p_name, 3)                                     AS not_left2,
           substr(p_name, 1, greatest(length(p_name) - 2, 0))    AS not_right2,
           concat_ws('-', p_brand, p_type)                       AS brand_type,
           upper(p_type)                                         AS type_upper,
           lower(p_brand)                                        AS brand_lower,
           concat_ws('/', p_brand, NULL, p_type)                 AS skip_null_concat
    FROM part
    """,
)
def expr_string_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        jx.length("p_name").alias("name_len"),
        jx.left("p_name", 5).alias("left5"),
        jx.right("p_name", 3).alias("right3"),
        jx.not_left("p_name", 2).alias("not_left2"),
        jx.not_right("p_name", 2).alias("not_right2"),
        jx.concat("-", "p_brand", "p_type").alias("brand_type"),
        jx.upper("p_type").alias("type_upper"),
        jx.lower("p_brand").alias("brand_lower"),
        jx.concat("/", "p_brand", F.lit(None), "p_type").alias("skip_null_concat"),
    )


@query(
    "expr_find_between",
    oracle="""
    SELECT event_id,
           CASE WHEN strpos(props, 'k') = 0 THEN NULL
                ELSE strpos(props, 'k') - 1 END                  AS find_k,
           CASE WHEN strpos(props, 'z') = 0 THEN NULL
                ELSE strpos(props, 'z') - 1 END                  AS find_missing,
           CASE WHEN strpos(props, '": ') = 0
                  OR strpos(substr(props, strpos(props, '": ') + 3), '}') = 0
                THEN NULL
                ELSE substr(props, strpos(props, '": ') + 3,
                            strpos(substr(props, strpos(props, '": ') + 3), '}') - 1)
           END                                                   AS between_val
    FROM events
    """,
)
def expr_find_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        jx.find("props", "k").alias("find_k"),
        jx.find("props", "z").alias("find_missing"),
        jx.between("props", '": ', "}").alias("between_val"),
    )


@query(
    "expr_math_kit",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity + l_extendedprice * l_discount              AS plain_arith,
           floor(l_extendedprice / 100) * 100                     AS floor_100,
           CAST(floor(l_quantity / 1) * 1 AS DOUBLE)              AS floor_1,
           ((CAST(l_linenumber AS BIGINT) - 4) % 3 + 3) % 3       AS pmod3,
           round(l_extendedprice * (1 - l_discount))              AS rounded0,
           abs(l_quantity - 25)                                   AS abs_dev,
           pow(l_discount, 2)                                     AS disc_sq,
           greatest(l_quantity, l_discount * 100, 10)             AS g3,
           least(l_quantity, l_tax * 100)                         AS l2,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE l_quantity / (l_linenumber - 1) END          AS div_by_zero_null
    FROM lineitem
    """,
)
def expr_math_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_quantity") + F.col("l_extendedprice") * F.col("l_discount")).alias("plain_arith"),
        (F.floor(F.col("l_extendedprice") / 100) * 100).cast("double").alias("floor_100"),
        jx.floor("l_quantity", 1).alias("floor_1"),
        jx.mod(F.col("l_linenumber").cast("bigint") - 4, F.lit(3)).alias("pmod3"),
        jx.round_(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rounded0"),
        jx.abs_(F.col("l_quantity") - 25).alias("abs_dev"),
        jx.power("l_discount", 2).alias("disc_sq"),
        jx.max_("l_quantity", F.col("l_discount") * 100, 10).alias("g3"),
        jx.min_("l_quantity", F.col("l_tax") * 100).alias("l2"),
        jx.div("l_quantity", F.col("l_linenumber") - 1).alias("div_by_zero_null"),
    )


@query(
    "expr_when_case_in",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 'hot' ELSE 'cold' END AS urgency,
           CASE WHEN o_orderstatus = 'F' THEN 'finished'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'partial' END                                           AS status_word,
           o_orderpriority IN ('1-URGENT', '2-HIGH')                         AS is_priority,
           NOT COALESCE(CASE WHEN o_orderkey % 4 = 0 THEN NULL
                             ELSE o_orderstatus = 'O' END, FALSE)            AS jx_not_with_missing
    FROM orders
    """,
)
def expr_when_case_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    maybe_open = F.when(F.col("o_orderkey") % 4 == 0, None).otherwise(F.col("o_orderstatus") == "O")
    return o.select(
        "o_orderkey",
        jx.when(F.col("o_orderpriority") == "1-URGENT", F.lit("hot"), F.lit("cold")).alias("urgency"),
        jx.case(
            (F.col("o_orderstatus") == "F", F.lit("finished")),
            (F.col("o_orderstatus") == "O", F.lit("open")),
            default=F.lit("partial"),
        ).alias("status_word"),
        jx.in_("o_orderpriority", ["1-URGENT", "2-HIGH"]).alias("is_priority"),
        jx.not_(maybe_open).alias("jx_not_with_missing"),
    )


@query(
    "expr_prefix_suffix_regex",
    oracle="""
    SELECT p_partkey,
           starts_with(p_type, 'ECO')                     AS is_eco,
           suffix(p_name, 'e')                            AS ends_e,
           regexp_full_match(p_brand, 'Brand#1[0-9]')     AS brand_teens,
           regexp_extract(p_brand, 'Brand#(\\d+)', 1)     AS brand_num_str,
           TRY_CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS BIGINT) AS brand_num,
           TRY_CAST(p_type AS BIGINT)                     AS garbage_cast
    FROM part
    """,
)
def expr_prefix_suffix_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        jx.prefix("p_type", "ECO").alias("is_eco"),
        jx.suffix("p_name", "e").alias("ends_e"),
        jx.regex("p_brand", "Brand#1[0-9]").alias("brand_teens"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num_str"),
        jx.to_integer(F.regexp_extract("p_brand", r"Brand#(\d+)", 1)).alias("brand_num"),
        jx.to_integer("p_type").alias("garbage_cast"),
    )


@query(
    "expr_date_kit",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP)  AS wk,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
           CAST(date_trunc('year', o_orderdate) AS TIMESTAMP)  AS yr,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
           o_orderdate + INTERVAL 3 MONTH                 AS plus_3mo,
           epoch_ms(o_orderdate)                          AS epoch_millis,
           year(o_orderdate)                              AS y,
           month(o_orderdate)                             AS m,
           dayofweek(o_orderdate) + 1                     AS dow
    FROM orders
    """,
)
def expr_date_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("week", "o_orderdate").alias("wk"),
        F.date_trunc("month", "o_orderdate").alias("mon"),
        F.date_trunc("year", "o_orderdate").alias("yr"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias("days_since_95"),
        F.expr("o_orderdate + INTERVAL 3 MONTH").alias("plus_3mo"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("epoch_millis"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.expr("dayofweek(o_orderdate)").alias("dow"),
    )

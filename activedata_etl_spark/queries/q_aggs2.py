"""Second-wave [Q] pairs: windowed exact percentile, count_values
histogram, meta.columns catalog, jx date literals, skewed two-phase
distinct."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import aggs as A
from ..functions.dates import date_lit
from ..io import describe_columns, load_table
from ..operators import skew as SK
from ..operators import windows as W
from .registry import query


@query(
    "window_exact_percentile",
    oracle="""
    SELECT o_orderkey,
           quantile_cont(o_totalprice, 0.5) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5,
           quantile_cont(o_totalprice, 0.25) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS p25_5
    FROM orders
    """,
)
def window_exact_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile over a bounded sliding frame (no Spark builtin —
    SURVEY.md §4.3 #3: collect frame → sort → interpolate)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.sliding(W.spec(["o_custkey"], [F.col("o_orderkey")]), -4, 0)
    return o.select(
        "o_orderkey",
        W.exact_percentile_over("o_totalprice", w, 0.5).alias("med5"),
        W.exact_percentile_over("o_totalprice", w, 0.25).alias("p25_5"),
    )


@query(
    "agg_count_values",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(l_linestatus || ':' || n)), '|') AS histogram
    FROM (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2
    ) GROUP BY l_returnflag
    """,
)
def agg_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx ``count_values``: per-group histogram of a column's values,
    serialized 'value:count|...' (sorted) — array cells are
    driver-unhashable."""
    li = load_table(spark, sf_dir, "lineitem")
    inner = li.groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))
    return inner.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_list(
            F.concat_ws(":", F.col("l_linestatus"), F.col("n"))
        )), "|").alias("histogram"))


@query(
    "meta_columns",
    oracle="""
    SELECT 'n_nationkey' AS "column", 'int' AS dtype,
           COUNT(DISTINCT n_nationkey) AS cardinality,
           COUNT(*) - COUNT(n_nationkey) AS n_nulls FROM nation
    UNION ALL
    SELECT 'n_name', 'string', COUNT(DISTINCT n_name),
           COUNT(*) - COUNT(n_name) FROM nation
    UNION ALL
    SELECT 'n_regionkey', 'int', COUNT(DISTINCT n_regionkey),
           COUNT(*) - COUNT(n_regionkey) FROM nation
    """,
)
def meta_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's queryable column catalog (meta.columns): name,
    type, cardinality, null count — one aggregate pass + unpivot."""
    n = load_table(spark, sf_dir, "nation")
    return describe_columns(n)


@query(
    "meta_columns_nested",
    oracle="""
    SELECT 'o_orderkey' AS "column", 'bigint' AS dtype, 0 AS nested_depth,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)    AS cardinality,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT)  AS n_nulls,
           CAST(COUNT(o_orderkey) AS BIGINT)             AS n_values
    FROM orders
    UNION ALL
    SELECT 'info.status', 'string', 0,
           COUNT(DISTINCT o_orderstatus),
           COUNT(*) - COUNT(o_orderstatus), COUNT(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'info.price', 'double', 0,
           COUNT(DISTINCT o_totalprice),
           COUNT(*) - COUNT(o_totalprice), COUNT(o_totalprice)
    FROM orders
    UNION ALL
    SELECT 'items.l_linenumber', 'int', 1,
           COUNT(DISTINCT l_linenumber),
           COUNT(*) - COUNT(l_linenumber), COUNT(l_linenumber)
    FROM lineitem
    UNION ALL
    SELECT 'items.l_quantity', 'double', 1,
           COUNT(DISTINCT l_quantity),
           COUNT(*) - COUNT(l_quantity), COUNT(l_quantity)
    FROM lineitem
    """,
)
def meta_columns_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """meta.columns over a NESTED document (the reference ColumnList's
    remaining behavior — jx_elasticsearch/meta.py enumerates struct and
    nested-array leaf paths with their nested depth, r8 verdict missing
    #2): orders carrying a struct (info.*) and a nested lineitem array
    (items.*, built by ETL-time nest) get one catalog row PER LEAF PATH
    with nested_depth = array hops. The oracle states each leaf's
    cardinality/null/value counts straight from the relational base
    tables — green proves array-leaf counting at element multiplicity
    (items.* counts equal lineitem's, not orders'), missing-array
    absorption (orders without items contribute no elements), and the
    dotted-path naming."""
    from ..io import describe_columns_nested
    from ..operators import nested as N

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.struct(F.col("o_orderstatus").alias("status"),
                 F.col("o_totalprice").alias("price")).alias("info"))
    li = load_table(spark, sf_dir, "lineitem")
    items = N.nest(li, parent_keys=["l_orderkey"],
                   item_cols=["l_linenumber", "l_quantity"],
                   order_by="l_linenumber")
    doc = (o.join(items, o.o_orderkey == items.l_orderkey, "left")
           .drop("l_orderkey"))
    return describe_columns_nested(doc)


@query(
    "jx_date_literals",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-03-01' - INTERVAL 1 WEEK
    """,
)
def jx_date_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx relative-date literals resolved at plan time with an injected
    clock (determinism: the oracle can't re-evaluate 'now')."""
    fixed_now = dt.datetime(1996, 3, 14, 12, 0, 0)
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= date_lit("year", now=fixed_now))
        & (F.col("o_orderdate") < date_lit("month-week", now=fixed_now))
    ).select("o_orderkey")


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond cube/rollup's fixed lattices) via
    the SQL surface — Catalyst expands to a single-pass Expand node."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@query(
    "skew_two_phase_distinct",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_l_partkey
    FROM lineitem GROUP BY l_returnflag
    """,
)
def skew_two_phase_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase distinct count — same result as COUNT(DISTINCT),
    skew-proof plan (partials on (key, salt-of-value) first)."""
    li = load_table(spark, sf_dir, "lineitem")
    return SK.salted_count_distinct(li, "l_returnflag", "l_partkey")


@query(
    "agg_percentile_giant_group",
    oracle="""
    SELECT percentile_cont(0.5)  WITHIN GROUP (ORDER BY CAST(l_extendedprice AS DOUBLE)) AS p50,
           percentile_cont(0.9)  WITHIN GROUP (ORDER BY CAST(l_extendedprice AS DOUBLE)) AS p90,
           percentile_cont(0.99) WITHIN GROUP (ORDER BY CAST(l_extendedprice AS DOUBLE)) AS p99
    FROM lineitem
    """,
)
def agg_percentile_giant_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global percentiles of a near-unique column — the worst case
    for per-group sorting (ONE group ⇒ one task). The pruned path scans
    for approximate brackets + exact rank counts, then sorts only the
    tiny in-bracket candidate set; no stage ever sorts the full column
    (functions/aggs.pruned_percentiles — the 100 TB plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return A.pruned_percentiles(li, [], "l_extendedprice",
                                {"p50": 0.5, "p90": 0.9, "p99": 0.99})


@query(
    "agg_weighted_percentile",
    oracle="""
    WITH h AS (
      SELECT lang, n_chars AS v, SUM(len(string_split_regex(lower(trim(text)), '\\s+'))) AS w
      FROM documents GROUP BY lang, n_chars
    ), c AS (
      SELECT lang, v, w,
             SUM(w) OVER (PARTITION BY lang ORDER BY v) AS cum,
             SUM(w) OVER (PARTITION BY lang) AS tot
      FROM h
    )
    SELECT lang,
           MIN(CASE WHEN cum >= 0.5 * tot THEN v END)  AS wmed_chars,
           MIN(CASE WHEN cum >= 0.9 * tot THEN v END)  AS wp90_chars
    FROM c GROUP BY lang
    """,
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-WEIGHTED exact percentiles of doc length per language: the
    length below which 50% / 90% of the corpus TOKENS sit (a kept-token
    budget gate, not a document-count gate). Lower-percentile definition,
    histogram-shaped plan (one row per distinct value shuffles)."""
    from ..ext import text as TX

    d = load_table(spark, sf_dir, "documents")
    weighted = d.select("lang", "n_chars",
                        F.size(TX.tokens("text")).alias("w"))
    return A.weighted_percentiles(weighted, ["lang"], "n_chars", "w",
                                  {"wmed_chars": 0.5, "wp90_chars": 0.9})


@query(
    "meta_columns_refresh",
    oracle="""
    WITH stacked AS (
      SELECT 'o_orderkey' AS col, CAST(o_orderkey AS VARCHAR) AS v
      FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_orderstatus', o_orderstatus FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
    ), h AS (
      SELECT col, md5(v) AS hx FROM stacked WHERE v IS NOT NULL
    ), r AS (
      SELECT col,
             (strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16
               + strpos('0123456789abcdef', substring(hx, 2, 1)) - 1
               AS bucket,
             list_reduce(list_transform(range(3, 18),
               i -> CAST(strpos('0123456789abcdef', substring(hx, i, 1)) - 1
                         AS BIGINT)),
               (a, b) -> a * 16 + b) AS x
      FROM h
    ), regs AS (
      SELECT col, bucket,
             MAX(CASE WHEN x = 0 THEN 61 ELSE 61 - length(bin(x)) END)
               AS max_rho
      FROM r GROUP BY 1, 2
    ), hs AS (
      SELECT col, CAST(COUNT(*) AS BIGINT) AS n_buckets,
             SUM(CAST((CAST(1 AS BIGINT) << (61 - max_rho))
                      AS DECIMAL(38,0))) AS present_sum
      FROM regs GROUP BY 1
    ), est AS (
      SELECT col, n_buckets,
             present_sum + (256 - n_buckets)
               * CAST((CAST(1 AS BIGINT) << 61) AS DECIMAL(38,0))
               AS harmonic
      FROM hs
    ), cnt AS (
      SELECT col, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS exact_ndv
      FROM stacked GROUP BY 1
    )
    SELECT cnt.col AS "column", n_rows, n_nulls, exact_ndv, n_buckets,
           CAST(256 - n_buckets AS BIGINT) AS n_zero,
           CAST(harmonic AS VARCHAR) AS harmonic_scaled,
           1.0854228543761655e+23 / CAST(CAST(harmonic AS VARCHAR) AS DOUBLE)
             AS raw_est,
           CASE WHEN 1.0854228543761655e+23
                     / CAST(CAST(harmonic AS VARCHAR) AS DOUBLE) > 640.0
                THEN abs(1.0854228543761655e+23
                         / CAST(CAST(harmonic AS VARCHAR) AS DOUBLE)
                         - exact_ndv) / exact_ndv < 0.15
                ELSE NULL END AS within_tolerance
    FROM cnt JOIN est ON cnt.col = est.col
    """,
)
def meta_columns_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog cardinality REFRESH (io.describe_columns_refresh, VERDICT
    r7 #8): per-column NDV via the portable md5-HLL registers in one
    stacked scan — the scheduled-maintenance path where the exact
    countDistinct catalog would re-shuffle the whole table per refresh.
    Audit columns ride along: exact NDV from the same stacked pass and a
    tolerance flag (raw regime only, est > 2.5·m = 640 — below that the
    raw HLL estimate needs the linear-counting correction, whose ln() is
    deliberately excluded from hashed outputs; flag NULL there, same
    contract as agg_hll_estimate). Integer/string columns only: their
    CAST-to-string is engine-identical, which is what makes every
    register and estimate bit-reproducible by the oracle."""
    from ..io import describe_columns_refresh

    o = load_table(spark, sf_dir, "orders")
    out = describe_columns_refresh(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"])
    return out.withColumn(
        "within_tolerance",
        F.when(F.col("raw_est") > 640.0,
               F.abs(F.col("raw_est") - F.col("exact_ndv"))
               / F.col("exact_ndv") < 0.15))

"""[Q] pairs driven through the jx JSON front-end (plans/) — proving the
whole pipeline: JSON query → expression compile → DataFrame plan →
matches the independent SQL oracle. This is the reference's API surface
(jx_python.jx.run / the ActiveData query service) on Spark."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.exact import sql_davg, sql_dsum
from ..io import register_views
from ..plans import query as JX
from .registry import query


def _run(spark: SparkSession, sf_dir: str, q: dict) -> DataFrame:
    register_views(spark, sf_dir)
    return JX.run(spark, q)


@query(
    "jx_filter_project",
    oracle="""
    SELECT o_orderkey,
           o_totalprice * 1.1 AS with_markup,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 'rush' ELSE 'normal' END AS speed
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 150000
    """,
)
def jx_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, {
        "from": "orders",
        "where": {"and": [
            {"eq": {"o_orderstatus": "O"}},
            {"gt": ["o_totalprice", 150000]},
        ]},
        "select": [
            {"name": "o_orderkey", "value": "o_orderkey"},
            {"name": "with_markup", "value": {"mult": ["o_totalprice", 1.1]}},
            {"name": "speed", "value": {"when": {"eq": {"o_orderpriority": "1-URGENT"}},
                                        "then": {"literal": "rush"},
                                        "else": {"literal": "normal"}}},
        ],
    })


@query(
    "jx_groupby_agg",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {sql_dsum('l_quantity')} AS total_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           MAX(l_discount) AS max_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def jx_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, {
        "from": "lineitem",
        "groupby": "l_returnflag",
        "select": [
            {"name": "n", "aggregate": "count"},
            {"name": "total_qty", "value": "l_quantity", "aggregate": "sum"},
            {"name": "avg_price", "value": "l_extendedprice", "aggregate": "avg"},
            {"name": "max_disc", "value": "l_discount", "aggregate": "max"},
        ],
    })


@query(
    "jx_edges_set_dense",
    oracle=f"""
    SELECT d.o_orderstatus, COALESCE(a.n, 0) AS n, a.revenue
    FROM (VALUES ('O'), ('F'), ('P'), ('X')) d(o_orderstatus)
    LEFT JOIN (
      SELECT o_orderstatus, COUNT(*) AS n, {sql_dsum('o_totalprice')} AS revenue
      FROM orders GROUP BY 1
    ) a USING (o_orderstatus)
    """,
)
def jx_edges_set_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, {
        "from": "orders",
        "edges": [{
            "value": "o_orderstatus",
            "domain": {"type": "set", "partitions": ["O", "F", "P", "X"]},
        }],
        "select": [
            {"name": "n", "aggregate": "count"},
            {"name": "revenue", "value": "o_totalprice", "aggregate": "sum"},
        ],
    })


@query(
    "jx_edges_range_histogram",
    oracle="""
    SELECT CAST(d.price_bin AS DOUBLE) AS price_bin, COALESCE(a.n, 0) AS n
    FROM (SELECT unnest(range(0, 600000, 50000)) AS price_bin) d
    LEFT JOIN (
      SELECT floor(o_totalprice / 50000) * 50000 AS price_bin, COUNT(*) AS n
      FROM orders GROUP BY 1
    ) a ON CAST(d.price_bin AS DOUBLE) = a.price_bin
    """,
)
def jx_edges_range_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, {
        "from": "orders",
        "edges": [{
            "name": "price_bin",
            "value": "o_totalprice",
            "domain": {"type": "range", "min": 0, "max": 600000, "interval": 50000},
        }],
        "select": [{"name": "n", "aggregate": "count"}],
    })


@query(
    "jx_edges_duration_histogram",
    oracle="""
    SELECT CAST(d.dur_bin AS BIGINT) AS dur_bin, COALESCE(a.n, 0) AS n
    FROM (SELECT unnest(range(0, 600, 60)) AS dur_bin) d
    LEFT JOIN (
      SELECT CAST(floor(value / 60) * 60 AS BIGINT) AS dur_bin, COUNT(*) AS n
      FROM events GROUP BY 1
    ) a ON CAST(d.dur_bin AS BIGINT) = a.dur_bin
    """,
)
def jx_edges_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration domain through the jx front-end: duration literals
    ("1 minute") parsed to seconds, dense bins emitted as BIGINT seconds."""
    return _run(spark, sf_dir, {
        "from": "events",
        "edges": [{
            "name": "dur_bin",
            "value": "value",
            "domain": {"type": "duration", "min": 0, "max": "10 minute",
                       "interval": "1 minute"},
        }],
        "select": [{"name": "n", "aggregate": "count"}],
    })


@query(
    "jx_window_running",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
    FROM orders
    """,
)
def jx_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, {
        "from": "orders",
        "select": ["o_orderkey", "o_custkey", "o_totalprice"],
        "window": [
            {"name": "running", "value": "o_totalprice", "aggregate": "sum",
             "edges": ["o_custkey"], "sort": ["o_orderkey"]},
            {"name": "rn", "aggregate": "row_number",
             "edges": ["o_custkey"], "sort": ["o_orderkey"]},
        ],
    })


@query(
    "jx_select_nested_output",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus       AS info_status,
           o_totalprice        AS info_money_total,
           o_totalprice * 1.1  AS info_money_markup
    FROM orders
    """,
)
def jx_select_nested_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dotted select names build nested output structs (reshape-on-select,
    _normalize_select): "info.money.total" → info.money.total. The struct
    is built by the planner, then projected back to scalar fields for the
    driver (struct cells are driver-unhashable)."""
    df = _run(spark, sf_dir, {
        "from": "orders",
        "select": [
            {"name": "o_orderkey", "value": "o_orderkey"},
            {"name": "info.status", "value": "o_orderstatus"},
            {"name": "info.money.total", "value": "o_totalprice"},
            {"name": "info.money.markup", "value": {"mult": ["o_totalprice", 1.1]}},
        ],
    })
    return df.select(
        "o_orderkey",
        F.col("info.status").alias("info_status"),
        F.col("info.money.total").alias("info_money_total"),
        F.col("info.money.markup").alias("info_money_markup"),
    )


@query(
    "jx_agg_percentile_union",
    oracle="""
    SELECT l_linestatus,
           percentile_cont(0.75) WITHIN GROUP (ORDER BY CAST(l_quantity AS DOUBLE)) AS p75_qty,
           percentile_cont(0.5)  WITHIN GROUP (ORDER BY CAST(l_extendedprice AS DOUBLE)) AS med_price,
           array_to_string(list_sort(list(DISTINCT l_returnflag)), '|') AS flags,
           COUNT(DISTINCT l_suppkey) AS n_supp
    FROM lineitem GROUP BY l_linestatus
    """,
)
def jx_agg_percentile_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median/percentile/union/cardinality aggregates through the JSON
    front-end (select.aggregate with the 'percentile' parameter); the
    union set is '|'-serialized (array cells are driver-unhashable)."""
    df = _run(spark, sf_dir, {
        "from": "lineitem",
        "groupby": "l_linestatus",
        "select": [
            {"name": "p75_qty", "value": "l_quantity",
             "aggregate": "percentile", "percentile": 0.75},
            {"name": "med_price", "value": "l_extendedprice", "aggregate": "median"},
            {"name": "flags", "value": "l_returnflag", "aggregate": "union"},
            {"name": "n_supp", "value": "l_suppkey", "aggregate": "cardinality"},
        ],
    })
    return df.withColumn("flags", F.array_join("flags", "|"))


@query(
    "jx_edges_time_dense",
    oracle=f"""
    SELECT d.mon, COALESCE(a.n, 0) AS n
    FROM (
      SELECT unnest(generate_series(
        (SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS TIMESTAMP) FROM orders),
        (SELECT CAST(date_trunc('month', MAX(o_orderdate)) AS TIMESTAMP) FROM orders),
        INTERVAL 1 MONTH)) AS mon
    ) d
    LEFT JOIN (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, COUNT(*) AS n
      FROM orders GROUP BY 1
    ) a USING (mon)
    """,
)
def jx_edges_time_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar time-domain edges through the JSON front-end."""
    return _run(spark, sf_dir, {
        "from": "orders",
        "edges": [{"name": "mon", "value": "o_orderdate",
                   "domain": {"type": "time", "interval": "month"}}],
        "select": [{"name": "n", "aggregate": "count"}],
    })


@query(
    "jx_edges_two_dim_dense",
    oracle=f"""
    SELECT d1.o_orderstatus, d2.o_orderpriority,
           COALESCE(a.n, 0) AS n, a.revenue
    FROM (VALUES ('O'), ('F'), ('P'), ('X')) d1(o_orderstatus)
    CROSS JOIN (VALUES ('1-URGENT'), ('2-HIGH'), ('3-MEDIUM'),
                       ('4-NOT SPECIFIED'), ('5-LOW')) d2(o_orderpriority)
    LEFT JOIN (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             {sql_dsum('o_totalprice')} AS revenue
      FROM orders GROUP BY 1, 2
    ) a USING (o_orderstatus, o_orderpriority)
    """,
)
def jx_edges_two_dim_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-edge dense cube: 4×5 = 20 cells ALWAYS, including the entire
    empty 'X' row — the reference's N-dim cube output, where the cell
    lattice is the cross product of edge domains."""
    return _run(spark, sf_dir, {
        "from": "orders",
        "edges": [
            {"value": "o_orderstatus",
             "domain": {"type": "set", "partitions": ["O", "F", "P", "X"]}},
            {"value": "o_orderpriority",
             "domain": {"type": "set",
                        "partitions": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                                       "4-NOT SPECIFIED", "5-LOW"]}},
        ],
        "select": [
            {"name": "n", "aggregate": "count"},
            {"name": "revenue", "value": "o_totalprice", "aggregate": "sum"},
        ],
    })


@query(
    "jx_nested_having",
    oracle=f"""
    SELECT * FROM (
      SELECT c_nationkey, COUNT(*) AS n, {sql_dsum('c_acctbal')} AS bal
      FROM customer GROUP BY c_nationkey
    ) WHERE n >= 5
    ORDER BY bal DESC LIMIT 10
    """,
)
def jx_nested_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx's HAVING: a query whose `from` is another query."""
    return _run(spark, sf_dir, {
        "from": {
            "from": "customer",
            "groupby": "c_nationkey",
            "select": [
                {"name": "n", "aggregate": "count"},
                {"name": "bal", "value": "c_acctbal", "aggregate": "sum"},
            ],
        },
        "where": {"gte": ["n", 5]},
        "sort": [{"value": "bal", "sort": -1}],
        "limit": 10,
    })


@query(
    "jx_edges_expression",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) * 50000 AS DOUBLE) AS price_band,
           COUNT(*) AS n,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY 1
    """,
)
def jx_edges_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge on a COMPUTED value (jx floor-to-multiple) — the edge clause
    accepts any expression, not just a column name."""
    return _run(spark, sf_dir, {
        "from": "orders",
        "edges": [{"name": "price_band",
                   "value": {"floor": ["o_totalprice", 50000]}}],
        "select": [
            {"name": "n", "aggregate": "count"},
            {"name": "max_price", "value": "o_totalprice", "aggregate": "max"},
        ],
    })


@query(
    "jx_window_ntile_first_last",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           NTILE(4) OVER w AS quartile,
           FIRST_VALUE(c_acctbal) OVER
             (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_bal,
           LAST_VALUE(c_acctbal) OVER
             (w ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS next2_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey)
    """,
)
def jx_window_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window corpus: ntile bucketing, first_value over the running frame,
    last_value over a bounded look-ahead frame — all through the jx window
    clause, sorted on a unique key so every engine agrees."""
    return _run(spark, sf_dir, {
        "from": "customer",
        "select": ["c_custkey", "c_nationkey", "c_acctbal"],
        "window": [
            {"name": "quartile", "aggregate": "ntile", "buckets": 4,
             "edges": ["c_nationkey"], "sort": ["c_custkey"]},
            {"name": "first_bal", "aggregate": "first", "value": "c_acctbal",
             "edges": ["c_nationkey"], "sort": ["c_custkey"]},
            {"name": "next2_bal", "aggregate": "last", "value": "c_acctbal",
             "edges": ["c_nationkey"], "sort": ["c_custkey"],
             "range": {"min": 0, "max": 2}},
        ],
    })


@query(
    "jx_select_default",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN o_totalprice ELSE 0 END AS big_price,
           COALESCE(CASE WHEN o_orderstatus = 'P' THEN o_orderpriority END, 'none') AS p_prio
    FROM orders
    """,
)
def jx_select_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select.default fills missing values: a `when` with no `else` yields
    missing, and the clause-level default coalesces it — jx's notion that
    missing is a value, not an error."""
    return _run(spark, sf_dir, {
        "from": "orders",
        "select": [
            "o_orderkey",
            {"name": "big_price", "default": 0,
             "value": {"when": {"gt": ["o_totalprice", 200000]},
                       "then": "o_totalprice"}},
            {"name": "p_prio", "default": "none",
             "value": {"when": {"eq": {"o_orderstatus": "P"}},
                       "then": "o_orderpriority"}},
        ],
    })


@query(
    "jx_edges_allow_nulls",
    oracle=f"""
    WITH m AS (
      SELECT CASE WHEN event_type IN ('click', 'view') THEN event_type END AS et,
             value
      FROM events
    ), a AS (
      SELECT et, COUNT(*) AS n, {sql_dsum('value')} AS total
      FROM m GROUP BY et
    ), dom AS (SELECT unnest(['click', 'view', NULL]) AS et)
    SELECT dom.et AS et, COALESCE(a.n, 0) AS n, a.total
    FROM dom LEFT JOIN a ON dom.et IS NOT DISTINCT FROM a.et
    """,
)
def jx_edges_allow_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edges with allowNulls: values outside the set domain (or missing)
    land in a NULL-keyed overflow part appended to the domain — the
    reference's allowNulls=true cell (es52/decoders.py). The completion
    join is null-safe (`<=>`) so the overflow cell actually fills."""
    return _run(spark, sf_dir, {
        "from": "events",
        "edges": [{"name": "et", "value": "event_type", "allowNulls": True,
                   "domain": {"type": "set", "partitions": ["click", "view"]}}],
        "select": [
            {"name": "n", "aggregate": "count"},
            {"name": "total", "value": "value", "aggregate": "sum"},
        ],
    })


@query(
    "jx_cube_allow_nulls",
    oracle=f"""
    WITH m AS (
      SELECT CASE WHEN o_orderstatus IN ('O', 'F') THEN o_orderstatus END AS status,
             CASE WHEN o_totalprice >= 0 AND o_totalprice < 300000
                  THEN CAST(floor(o_totalprice / 100000) * 100000 AS DOUBLE)
             END AS price_bin,
             o_totalprice
      FROM orders
    ), a AS (
      SELECT status, price_bin, COUNT(*) AS n, {sql_dsum('o_totalprice')} AS revenue
      FROM m GROUP BY status, price_bin
    ), d1 AS (SELECT unnest(['O', 'F', NULL]) AS status),
       d2 AS (SELECT CAST(unnest([0, 100000, 200000, NULL]) AS DOUBLE) AS price_bin)
    SELECT d1.status AS status, d2.price_bin AS price_bin,
           COALESCE(a.n, 0) AS n, a.revenue
    FROM d1 CROSS JOIN d2
    LEFT JOIN a ON d1.status IS NOT DISTINCT FROM a.status
               AND d2.price_bin IS NOT DISTINCT FROM a.price_bin
    """,
)
def jx_cube_allow_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-edge dense cube where BOTH edges carry allowNulls overflow
    parts: the cell lattice is (set parts + NULL) × (range parts + NULL)
    = 3×4 = 12 cells ALWAYS — out-of-domain statuses ('P') fall into the
    status-NULL row, prices ≥ max into the bin-NULL column, and their
    intersection cell holds rows outside both domains. This is the
    reference cube output's allowNulls semantics (es52/decoders.py
    include-missing bucket) over an N-dim lattice, with empty count
    cells zero-filled and empty sums NULL."""
    return _run(spark, sf_dir, {
        "from": "orders",
        "edges": [
            {"name": "status", "value": "o_orderstatus", "allowNulls": True,
             "domain": {"type": "set", "partitions": ["O", "F"]}},
            {"name": "price_bin", "value": "o_totalprice", "allowNulls": True,
             "domain": {"type": "range", "min": 0, "max": 300000,
                        "interval": 100000}},
        ],
        "select": [
            {"name": "n", "aggregate": "count"},
            {"name": "revenue", "value": "o_totalprice", "aggregate": "sum"},
        ],
    })


@query(
    "jx_window_percentile",
    oracle="""
    SELECT o_orderkey, o_custkey,
           quantile_cont(o_totalprice, 0.5) OVER w AS med5,
           quantile_cont(o_totalprice, 0.25) OVER w AS p25_5
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def jx_window_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.6: percentile/median as a window aggregate reachable
    through the jx JSON ``window`` clause (not just the DataFrame helper):
    plans/query.py routes aggregate=percentile|median to
    operators.windows.exact_percentile_over, inheriting its in-plan
    max_frame_rows guard — the bounded-frame exact percentile the
    reference's incremental window accumulators provide."""
    return _run(spark, sf_dir, {
        "from": "orders",
        "select": ["o_orderkey", "o_custkey"],
        "window": [
            {"name": "med5", "value": "o_totalprice", "aggregate": "median",
             "edges": ["o_custkey"], "sort": ["o_orderkey"],
             "range": {"min": -4, "max": 0}},
            {"name": "p25_5", "value": "o_totalprice",
             "aggregate": "percentile", "percentile": 0.25,
             "edges": ["o_custkey"], "sort": ["o_orderkey"],
             "range": {"min": -4, "max": 0}},
        ],
    })


@query(
    "jx_escaped_dot_name",
    oracle="""
    SELECT n_nationkey, n_name AS name, n_regionkey AS "dotted.out"
    FROM nation WHERE n_name >= 'NATION_2'
    """,
)
def jx_escaped_dot_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""mo_dots escaped-dot semantics (SURVEY §1.1; VERDICT r5 #5):
    ``a\.b`` names ONE column containing a literal dot, while ``a.b`` is
    a two-hop struct path. Spark expresses the distinction with backtick
    quoting — plans/expressions.variable resolves the escape on the
    INPUT side (where / select value / sort), and the OUTPUT side
    (_partition_path) keeps an escaped select name as one flat column
    named ``dotted.out`` instead of nesting a struct."""
    register_views(spark, sf_dir)
    from ..io import load_table

    load_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_name", "n.name").createOrReplaceTempView("nation_dotted")
    return JX.run(spark, {
        "from": "nation_dotted",
        "where": {"gte": ["n\\.name", {"literal": "NATION_2"}]},
        "select": ["n_nationkey",
                   {"name": "name", "value": "n\\.name"},
                   {"name": "dotted\\.out", "value": "n_regionkey"}],
        "sort": [{"value": "n\\.name", "sort": -1}],
    })


@query(
    "edges_default_domain_cap",
    oracle="""
    WITH f AS (
      SELECT o_custkey AS cust, CAST(COUNT(*) AS BIGINT) AS n,
             MAX(o_totalprice) AS max_price
      FROM orders GROUP BY 1
    ), top AS (
      SELECT cust FROM f ORDER BY n DESC, cust ASC LIMIT 20
    )
    SELECT f.cust AS cust, f.n AS n, f.max_price AS max_price
    FROM f JOIN top USING (cust)
    UNION ALL
    SELECT * FROM (
      SELECT NULL AS cust, CAST(SUM(n) AS BIGINT) AS n,
             MAX(max_price) AS max_price
      FROM f WHERE cust NOT IN (SELECT cust FROM top)
    ) WHERE n IS NOT NULL
    """,
)
def edges_default_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`default` edge domains are CAPPED at the top-N observed values by
    frequency (VERDICT r7 #2 — the reference's DefaultDomain limit), the
    tail absorbed by the NULL overflow part instead of enumerating an
    unbounded observed distinct. o_custkey has 150/1500/15k distinct
    values at sf0.001/0.01/0.1, so `limit: 20` exercises the cap — and
    the deterministic (frequency DESC, value ASC) tie-break — at every
    scale: 20 top-customer rows plus one overflow row carrying the count
    and max over everyone else. The 100 TB point: a dense multi-edge
    cube over high-cardinality columns can no longer cross-join an
    unbounded cell grid; each default edge contributes at most
    domain.limit cells."""
    return _run(spark, sf_dir, {
        "from": "orders",
        "edges": [{"name": "cust", "value": "o_custkey",
                   "domain": {"type": "default", "limit": 20}}],
        "select": [
            {"name": "n", "aggregate": "count"},
            {"name": "max_price", "value": "o_totalprice",
             "aggregate": "max"},
        ],
    })

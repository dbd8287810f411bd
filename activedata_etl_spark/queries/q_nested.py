"""Nested/JSON [Q] pairs — SURVEY.md §2.9 (array + JSON tables).

The testdata has no natively nested table (FIXTURES.md), so nested frames
are built in-engine with ``nest`` (collect_list of structs — the ETL-time
denormalization the reference performs) and then queried; the oracle
checks the round-trip against the flat truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from ..operators import nested as N
from .registry import query


def _nested_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return N.nest(
        li, parent_keys=["l_orderkey"],
        item_cols=["l_linenumber", "l_quantity", "l_extendedprice"],
        order_by="l_linenumber",
    )


@query(
    "nested_explode_roundtrip",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    """,
)
def nested_explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nest (collect per parent) → unnest (deep query) reproduces the
    child table exactly — explode is the inverse of ETL denormalization."""
    nested = _nested_orders(spark, sf_dir)
    return N.unnest(nested, "items", ["l_orderkey"]).select(
        "l_orderkey", "l_linenumber", "l_quantity")


@query(
    "nested_array_path",
    oracle="""
    SELECT l_orderkey,
           COUNT(*)                                   AS n_items,
           CAST(SUM(l_linenumber) AS BIGINT)          AS line_sum,
           MAX(l_quantity)                            AS max_qty,
           COUNT(CASE WHEN l_quantity > 45 THEN 1 END) > 0 AS any_bulk
    FROM lineitem GROUP BY l_orderkey
    """,
)
def nested_array_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FlatList semantics: ``items.l_quantity`` maps the path over every
    array member; exists-within-array via higher-order F.exists."""
    nested = _nested_orders(spark, sf_dir)
    qtys = F.col("items.l_quantity")  # dot-path through array → array
    return nested.select(
        "l_orderkey",
        F.size("items").alias("n_items"),
        F.aggregate(F.col("items.l_linenumber"), F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x).alias("line_sum"),
        F.array_max(qtys).alias("max_qty"),
        F.exists("items", lambda it: it.getField("l_quantity") > 45).alias("any_bulk"),
    )


@query(
    "nested_leaves",
    oracle="""
    SELECT o_orderkey    AS "ids.okey",
           o_custkey     AS "ids.ckey",
           o_orderstatus AS "info.status",
           o_totalprice  AS "info.price"
    FROM orders
    """,
)
def nested_leaves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jx {"leaves": "."}: nested doc → dotted-name leaf columns."""
    o = load_table(spark, sf_dir, "orders").select(
        F.struct(F.col("o_orderkey").alias("okey"),
                 F.col("o_custkey").alias("ckey")).alias("ids"),
        F.struct(F.col("o_orderstatus").alias("status"),
                 F.col("o_totalprice").alias("price")).alias("info"),
    )
    return N.leaves(o)


@query(
    "json_extract_ops",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT)       AS k_int,
           CAST(json_extract(props, '$.nope') AS BIGINT)    AS k_missing,
           to_json(struct_pack(t := event_type, u := user_id)) AS packed
    FROM events
    """,
)
def json_extract_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mo_json surface: parse (get_json_object / from_json with schema) and
    serialize (to_json); `events.props` is the JSON-string fixture."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT, nope BIGINT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        parsed.getField("nope").alias("k_missing"),
        F.to_json(F.struct(F.col("event_type").alias("t"),
                           F.col("user_id").alias("u"))).alias("packed"),
    )

"""Bucketed co-located join: the plan must contain NO shuffle exchange."""

import pytest
from pyspark.sql import functions as F

from activedata_etl_spark.io import load_table
from activedata_etl_spark.sources.bucketing import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    write_bucketed(li, "b_lineitem", "l_orderkey", buckets=8)
    write_bucketed(o, "b_orders", "l_orderkey", buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_colocated_join_has_no_shuffle(spark, warehouse):
    # disable broadcast so the planner must consider co-location (at real
    # scale neither fact side is broadcastable anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "Bucketed: true" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_colocated_join_correct(spark, sf_dir, warehouse):
    j = colocated_join(spark, "b_lineitem", "b_orders", "l_orderkey")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert j.count() == plain

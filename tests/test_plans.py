"""Physical-plan regression tests: the scale-critical plan properties
must survive refactors (SCALE.md's claims, mechanically enforced)."""

import pytest

from activedata_etl_spark.queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: orderkey/suppkey/partkey are not in the read schema
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_broadcast_joins_where_intended(spark, sf_dir):
    for name in ["join_inner_broadcast", "tpch_q5_local_supplier_volume",
                 "edges_time_months"]:
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, f"{name}: dim join degraded to SMJ"


def test_tpch_q5_single_fact_shuffle(spark, sf_dir):
    """5-way star: every dim broadcast ⇒ at most the lineitem⨝orders join
    and the final aggregate shuffle."""
    plan = _plan(spark, sf_dir, "tpch_q5_local_supplier_volume")
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 2, f"{n_shuffles} shuffles:\n{plan[:1500]}"


def test_topk_plans_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sort_multi_key_topk")
    assert "TakeOrderedAndProject" in plan  # top-k, not a full sort


def test_no_cartesian_in_lsh(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_lsh_jaccard_pairs")
    assert "CartesianProduct" not in plan
    plan2 = _plan(spark, sf_dir, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan2  # candidates come from buckets

"""jx↔SQL differential corpus — the reference's cross-engine test style
(one query corpus, every backend must agree; SURVEY.md §5.1): each corpus
entry runs through the jx JSON front-end AND as Spark SQL, and the result
sets must match exactly. Independent of the DuckDB oracle gate."""

import json
import os

import pytest

from activedata_etl_spark.io import register_views
from activedata_etl_spark.plans import query as JXQ
from activedata_etl_spark.plans.query import run_formatted

_CORPUS = json.load(open(os.path.join(os.path.dirname(__file__), "jx_corpus.json")))


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    register_views(spark, sf_dir)
    # nested child-table view for deep-from ("orders_nested.items") cases
    from activedata_etl_spark.io import load_table
    from activedata_etl_spark.operators import nested as N

    li = load_table(spark, sf_dir, "lineitem")
    N.nest(li, ["l_orderkey"], ["l_linenumber", "l_quantity"],
           order_by="l_linenumber").createOrReplaceTempView("orders_nested")


@pytest.mark.parametrize("case", _CORPUS, ids=[c["name"] for c in _CORPUS])
def test_jx_matches_sql(spark, case):
    jx_df = JXQ.run(spark, case["query"])
    sql_df = spark.sql(case["sql"])
    assert sorted(jx_df.columns) == sorted(sql_df.columns)
    a = sorted(tuple(r[c] for c in sorted(jx_df.columns)) for r in jx_df.collect())
    b = sorted(tuple(r[c] for c in sorted(sql_df.columns)) for r in sql_df.collect())
    if "limit" in case["query"]:
        assert len(a) == len(b)  # limited queries: sizes must agree…
    assert a == b, f"{case['name']}: jx and SQL disagree"


def test_run_formatted_shapes(spark):
    q = {"from": "nation", "groupby": "n_regionkey",
         "select": [{"name": "n", "aggregate": "count"}]}
    lst = run_formatted(spark, {**q, "format": "list"})
    assert isinstance(lst, list) and {"n_regionkey", "n"} <= set(lst[0])
    tbl = run_formatted(spark, {**q, "format": "table"})
    assert set(tbl["header"]) == {"n_regionkey", "n"}
    cube = run_formatted(spark, {
        "from": "nation", "edges": ["n_regionkey"],
        "select": [{"name": "n", "aggregate": "count"}], "format": "cube"})
    assert sum(cube["data"]["n"]) == 25

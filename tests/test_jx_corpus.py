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
    # a view with a LITERAL dot in a column name (mo_dots a\.b cases)
    load_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_name", "n.name").createOrReplaceTempView("nation_dotted")


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


def test_cube_allow_nulls_golden(spark):
    """Golden multi-edge cube with allowNulls overflow parts on BOTH
    axes: nation over regionkey set [0,1] (+NULL row for regions 2-4)
    × nationkey range [0,20) by 10 (+NULL column for keys ≥ 20). The
    formatter must append the overflow part LAST on each axis and place
    overflow aggregates in those cells."""
    cube = run_formatted(spark, {
        "from": "nation",
        "edges": [
            {"name": "rk", "value": "n_regionkey", "allowNulls": True,
             "domain": {"type": "set", "partitions": [0, 1]}},
            {"name": "nk", "value": "n_nationkey", "allowNulls": True,
             "domain": {"type": "range", "min": 0, "max": 20, "interval": 10}},
        ],
        "select": [{"name": "n", "aggregate": "count"}],
        "format": "cube",
    })
    assert [e["name"] for e in cube["edges"]] == ["rk", "nk"]
    assert cube["edges"][0]["domain"]["partitions"] == [0, 1, None]
    assert cube["edges"][1]["domain"]["partitions"] == [0.0, 10.0, None]
    # 25 nations: regions 0/1 have 5 nations each (keys spread over
    # 0..24), regions 2-4 (15 nations) land in the rk-overflow row;
    # nationkeys 20-24 (one per region) land in the nk-overflow column.
    assert cube["data"]["n"] == [
        [2, 2, 1],
        [2, 2, 1],
        [6, 6, 3],
    ]
    assert sum(map(sum, cube["data"]["n"])) == 25

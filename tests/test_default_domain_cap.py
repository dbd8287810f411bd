"""`default` edge domains cap at top-N-by-frequency with the tail in the
NULL overflow part (VERDICT r7 #2), and cube materialization is
cell-bounded — the two halves of the "unbounded dense grid" footgun."""

import pytest
from pyspark.sql import functions as F

from activedata_etl_spark.plans import query as JX
from activedata_etl_spark.plans.format import to_cube


@pytest.fixture()
def letters(spark):
    rows = ([("a", 1)] * 5 + [("b", 2)] * 3 + [("c", 3)] * 2
            + [("d", 4)] + [(None, 9)] * 2)
    df = spark.createDataFrame(rows, "k string, v int")
    df.createOrReplaceTempView("cap_letters")
    yield df
    spark.catalog.dropTempView("cap_letters")


def test_cap_merges_tail_and_nulls_into_overflow(spark, letters):
    out = JX.run(spark, {
        "from": "cap_letters",
        "edges": [{"name": "k", "value": "k",
                   "domain": {"type": "default", "limit": 2}}],
        "select": [{"name": "n", "aggregate": "count"}],
    }).collect()
    cells = {r["k"]: r["n"] for r in out}
    # top-2 by frequency: a (5), b (3); c+d+nulls → overflow
    assert cells == {"a": 5, "b": 3, None: 5}


def test_under_cap_is_identity(spark, letters):
    out = JX.run(spark, {
        "from": "cap_letters",
        "edges": [{"name": "k", "value": "k",
                   "domain": {"type": "default", "limit": 100}}],
        "select": [{"name": "n", "aggregate": "count"}],
    }).collect()
    cells = {r["k"]: r["n"] for r in out}
    # all observed values keep their own parts; nulls get the overflow
    assert cells == {"a": 5, "b": 3, "c": 2, "d": 1, None: 2}


def test_cap_tie_break_is_value_ascending(spark):
    df = spark.createDataFrame(
        [("z",)] * 2 + [("m",)] * 2 + [("a",)] * 2 + [("q",)],
        "k string")
    df.createOrReplaceTempView("cap_ties")
    try:
        out = JX.run(spark, {
            "from": "cap_ties",
            "edges": [{"name": "k", "value": "k",
                       "domain": {"type": "default", "limit": 2}}],
            "select": [{"name": "n", "aggregate": "count"}],
        }).collect()
        cells = {r["k"]: r["n"] for r in out}
        # a/m/z all have frequency 2 — the cap keeps the value-ascending
        # pair (a, m); z joins q in the overflow
        assert cells == {"a": 2, "m": 2, None: 3}
    finally:
        spark.catalog.dropTempView("cap_ties")


def test_two_edge_dense_grid_is_bounded(spark):
    df = spark.createDataFrame(
        [(i % 7, i % 5) for i in range(100)], "x int, y int")
    df.createOrReplaceTempView("cap_grid")
    try:
        out = JX.run(spark, {
            "from": "cap_grid",
            "edges": [
                {"name": "x", "value": "x",
                 "domain": {"type": "default", "limit": 3}},
                {"name": "y", "value": "y",
                 "domain": {"type": "default", "limit": 2}},
            ],
            "select": [{"name": "n", "aggregate": "count"}],
        }).collect()
        # the dense cross product is (3 + overflow) × (2 + overflow)
        assert len(out) == 4 * 3
        assert sum(r["n"] for r in out) == 100  # nothing dropped
    finally:
        spark.catalog.dropTempView("cap_grid")


def test_invalid_cap_rejected(spark, letters):
    with pytest.raises(ValueError, match="limit"):
        JX.run(spark, {
            "from": "cap_letters",
            "edges": [{"name": "k", "value": "k",
                       "domain": {"type": "default", "limit": 0}}],
            "select": [{"name": "n", "aggregate": "count"}],
        })


def test_cube_materialization_cell_guard(spark):
    df = spark.range(50).select(F.col("id").alias("e"),
                                F.lit(1).alias("n"))
    with pytest.raises(ValueError, match="cells"):
        to_cube(df, ["e"], ["n"], max_cells=10)
    # under the bound it materializes normally
    cube = to_cube(df.limit(5), ["e"], ["n"], max_cells=10)
    assert len(cube["data"]["n"]) == 5


def test_plan_only_skips_frequency_probe(spark, letters, monkeypatch):
    """format=explain must not execute the default-domain frequency
    probe (review finding): under plan_only the edge keys on the raw
    value and the domain derives lazily — _observed_parts is never
    called."""
    from activedata_etl_spark.plans import query as JXQ

    def boom(*a, **k):
        raise AssertionError("frequency probe executed under plan_only")

    monkeypatch.setattr(JXQ, "_observed_parts", boom)
    df = JXQ.run(spark, {
        "from": "cap_letters",
        "edges": [{"name": "k", "value": "k",
                   "domain": {"type": "default", "limit": 2}}],
        "select": [{"name": "n", "aggregate": "count"}],
    }, plan_only=True)
    # the plan analyzes; nothing was executed to build it
    assert "k" in df.columns and "n" in df.columns


def test_library_run_rejects_cursor(spark, letters):
    """run() must refuse a cursor clause loudly (review finding): only
    the service can emit the next cursor; silently ignoring it would
    return the first page for every request."""
    import pytest as _pytest

    from activedata_etl_spark.plans import query as JXQ

    with _pytest.raises(ValueError, match="cursor paging"):
        JXQ.run(spark, {"from": "cap_letters", "sort": "k",
                        "limit": 2, "cursor": {"after": ["a"]}})

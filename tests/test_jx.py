"""Golden tests for the jx JSON front-end (plans/) — the reference's test
style: tiny query dicts → expected rows (SURVEY.md §5), plus output
formats (list/table/cube)."""

import pytest
from pyspark.sql import functions as F

from activedata_etl_spark.io import register_views
from activedata_etl_spark.plans import format as FMT
from activedata_etl_spark.plans import query as JX
from activedata_etl_spark.plans.expressions import compile_expr


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    register_views(spark, sf_dir)


def _expr(spark, e, schema=None, **cols):
    if schema is None:
        schema = ", ".join(
            f"{k} {'string' if isinstance(v, str) else 'double' if isinstance(v, float) else 'bigint'}"
            for k, v in (cols or {"x": 1}).items())
    df = spark.createDataFrame([tuple((cols or {"x": 1}).values())], schema)
    return df.select(compile_expr(e).alias("r")).first()["r"]


def test_expr_literals_vs_variables(spark):
    assert _expr(spark, {"literal": "a"}, a=5) == "a"
    assert _expr(spark, "a", a=5) == 5
    assert _expr(spark, 3.5) == 3.5


def test_expr_null_semantics(spark):
    # eq(missing, missing) = true; add ignores missing; div/0 = missing
    assert _expr(spark, {"eq": ["a", "b"]}, schema="a bigint, b bigint",
                 a=None, b=None) is True
    assert _expr(spark, {"ne": ["a", "b"]}, schema="a bigint, b bigint",
                 a=None, b=1) is False
    assert _expr(spark, {"add": ["a", "b"]}, schema="a bigint, b bigint",
                 a=None, b=4) == 4
    assert _expr(spark, {"add": ["a", "b"]}, schema="a bigint, b bigint",
                 a=None, b=None) is None
    assert _expr(spark, {"div": ["a", "b"]}, schema="a double, b bigint",
                 a=1.0, b=0) is None
    assert _expr(spark, {"mod": ["a", "b"]}, a=-7, b=3) == 2  # floored


def test_expr_strings(spark):
    assert _expr(spark, {"left": ["s", 3]}, s="hello") == "hel"
    assert _expr(spark, {"find": ["s", "ll"]}, s="hello") == 2
    assert _expr(spark, {"find": ["s", "zz"]}, s="hello") is None
    assert _expr(spark, {"between": ["s", "h", "o"]}, s="hello") == "ell"
    assert _expr(spark, {"concat": ["s", "t"], "separator": "-"},
                 s="a", t="b") == "a-b"


def test_query_groupby_golden(spark):
    out = JX.run(spark, {
        "from": "region",
        "select": [{"name": "n", "aggregate": "count"}],
        "groupby": "r_name",
        "sort": ["r_name"],
    }).collect()
    assert [r["r_name"] for r in out] == sorted(r["r_name"] for r in out)
    assert all(r["n"] == 1 for r in out)


def test_query_where_limit(spark):
    out = JX.run(spark, {
        "from": "nation",
        "where": {"lt": ["n_nationkey", 5]},
        "select": ["n_nationkey", "n_name"],
        "sort": ["n_nationkey"],
        "limit": 3,
    }).collect()
    assert [r["n_nationkey"] for r in out] == [0, 1, 2]


def test_jx_leaves_select(spark):
    """{"select": {"leaves": "."}} flattens nested docs to dotted names."""
    spark.table("orders").select(
        F.struct(F.col("o_orderkey").alias("k"),
                 F.col("o_totalprice").alias("p")).alias("inner"),
        "o_orderstatus",
    ).createOrReplaceTempView("nested_view")
    out = JX.run(spark, {"from": "nested_view", "select": {"leaves": "."}})
    assert set(out.columns) == {"inner.k", "inner.p", "o_orderstatus"}
    assert out.count() == spark.table("orders").count()


def test_jx_window_median(spark):
    out = JX.run(spark, {
        "from": "orders",
        "select": ["o_orderkey", "o_custkey", "o_totalprice"],
        "window": [{"name": "med3", "value": "o_totalprice", "aggregate": "median",
                    "edges": ["o_custkey"], "sort": ["o_orderkey"],
                    "range": {"min": -2, "max": 0}}],
    }).collect()
    by_cust = {}
    for r in sorted(out, key=lambda r: (r["o_custkey"], r["o_orderkey"])):
        hist = by_cust.setdefault(r["o_custkey"], [])
        hist.append(r["o_totalprice"])
        frame = sorted(hist[-3:])
        import statistics
        assert abs(r["med3"] - statistics.median(frame)) < 1e-9
        if len(by_cust) > 20:
            break


def test_jx_stats_aggregate(spark):
    out = JX.run(spark, {
        "from": "region",
        "select": [{"name": "s", "value": "r_regionkey", "aggregate": "stats"}],
    }).first()["s"]
    assert out["count"] == 5 and out["min"] == 0 and out["max"] == 4
    assert out["mean"] == 2.0 and out["variance"] == 2.0


def test_formats_list_table_cube(spark):
    df = JX.run(spark, {
        "from": "nation",
        "groupby": "n_regionkey",
        "select": [{"name": "n", "aggregate": "count"}],
    })
    lst = FMT.to_list(df)
    assert {r["n_regionkey"] for r in lst} == {0, 1, 2, 3, 4}
    tbl = FMT.to_table(df)
    assert set(tbl["header"]) == {"n_regionkey", "n"}
    cube = FMT.to_cube(df, ["n_regionkey"], ["n"])
    assert cube["edges"][0]["domain"]["partitions"] == [0, 1, 2, 3, 4]
    assert sum(cube["data"]["n"]) == 25


def test_cube_two_edges(spark):
    df = JX.run(spark, {
        "from": "lineitem",
        "edges": ["l_returnflag", "l_linestatus"],
        "select": [{"name": "n", "aggregate": "count"}],
    })
    cube = FMT.to_cube(df, ["l_returnflag", "l_linestatus"], ["n"])
    flags = cube["edges"][0]["domain"]["partitions"]
    assert "A" in flags and "R" in flags
    total = sum(v for row in cube["data"]["n"] for v in row if v is not None)
    assert total == spark.table("lineitem").count()


def test_cube_multi_edge_allow_nulls(spark):
    """format=cube over two edges where one has an allowNulls overflow
    part: the null part appears as a LAST axis partition and its cells
    hold the out-of-domain rows (no row lost, no row double-counted)."""
    df = JX.run(spark, {
        "from": "orders",
        "edges": [
            {"name": "status", "value": "o_orderstatus", "allowNulls": True,
             "domain": {"type": "set", "partitions": ["O", "F"]}},
            {"name": "prio", "value": "o_orderpriority"},
        ],
        "select": [{"name": "n", "aggregate": "count"}],
    })
    cube = FMT.to_cube(df, ["status", "prio"], ["n"])
    parts = cube["edges"][0]["domain"]["partitions"]
    assert parts[:2] == ["F", "O"] and parts[2] is None  # overflow part last
    total = sum(v for row in cube["data"]["n"] for v in row if v is not None)
    assert total == spark.table("orders").count()  # 'P' rows in the null part
    null_row_total = sum(v for v in cube["data"]["n"][2] if v is not None)
    from pyspark.sql import functions as F
    expect_p = spark.table("orders").filter(F.col("o_orderstatus") == "P").count()
    assert null_row_total == expect_p


def test_deep_from_array_path(spark, sf_dir):
    """jx deep query: {"from": "view.arraycol"} explodes the child table,
    carrying parent columns (es52/deep.py semantics)."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.io import load_table
    from activedata_etl_spark.operators import nested as N
    from activedata_etl_spark.plans import query as JXQ

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    nested = N.nest(li, ["l_orderkey"], ["l_linenumber", "l_quantity"],
                    "l_linenumber")
    nested.createOrReplaceTempView("nested_orders")
    out = JXQ.run(spark, {
        "from": "nested_orders.items",
        "where": {"gt": ["l_quantity", 25]},
        "select": ["l_orderkey", "l_linenumber", "l_quantity"],
    })
    expect = li.filter(F.col("l_quantity") > 25) \
               .select("l_orderkey", "l_linenumber", "l_quantity")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, expect.collect()))


def test_cube_format_multi_edge_allow_nulls(spark, sf_dir):
    """format=cube over TWO edges where one carries an allowNulls
    overflow part: N-dim dense matrix, overflow axis part last (None),
    every cell accounted for."""
    from activedata_etl_spark.io import register_views
    from activedata_etl_spark.plans.query import run_formatted

    register_views(spark, sf_dir)
    out = run_formatted(spark, {
        "from": "events",
        "edges": [
            {"name": "et", "value": "event_type", "allowNulls": True,
             "domain": {"type": "set", "partitions": ["click", "view"]}},
            {"name": "uparity", "value": {"mod": ["user_id", 2]}},
        ],
        "select": [{"name": "n", "aggregate": "count"}],
        "format": "cube",
    })
    [e_et, e_up] = out["edges"]
    assert e_et["name"] == "et"
    assert e_et["domain"]["partitions"][-1] is None          # overflow last
    assert set(e_et["domain"]["partitions"][:-1]) == {"click", "view"}
    n = out["data"]["n"]
    assert len(n) == 3 and all(len(row) == len(e_up["domain"]["partitions"])
                               for row in n)
    total = sum(v for row in n for v in row if v is not None)
    from activedata_etl_spark.io import load_table
    assert total == load_table(spark, sf_dir, "events").count()


def test_window_name_shadowed_by_dotted_select(spark):
    # A select whose dotted output name "k.key" emits the TOP-LEVEL struct
    # column "k"; a window also named "k" must NOT be auto-carried through
    # the projection (pre-fix: duplicate/ambiguous "k" columns).
    df = JX.run(spark, {
        "from": "nation",
        "select": [{"name": "k.key", "value": "n_nationkey"}],
        "window": [{"name": "k", "value": "n_nationkey",
                    "aggregate": "max", "edges": "n_regionkey"}],
    })
    assert df.columns == ["k"]
    assert df.count() == 25 and df.select("k.key").distinct().count() == 25


def test_extension_op_from_clause_validation():
    from activedata_etl_spark.plans.validate import validate

    errs = validate({"from": {"op": "nope", "table": "documents"}})
    assert any(e["path"] == "from.op" for e in errs)
    errs = validate({"from": {"op": "near_dup_pairs"}})
    assert any(e["path"] == "from.table" for e in errs)
    assert validate({"from": {"op": "near_dup_pairs",
                              "table": "documents"}}) == []


def test_extension_ops_front_end_equals_direct(spark, sf_dir):
    """Every jx extension op must be a pure parameter-mapping shim: the
    front-end-routed result equals the direct Python-API call row for
    row. (The flagship three are also oracle-paired in the registry —
    jx_near_dup_pairs/jx_ann_topk/jx_quality_gate.)"""
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import dedup as DD, sampling as SA
    from activedata_etl_spark.ext import similarity as SIM
    from activedata_etl_spark.io import load_table, register_views
    from activedata_etl_spark.plans.query import run

    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    got = run(spark, {"from": {"op": "semantic_dedup", "table": "embeddings",
                               "nlist": 4, "threshold": 0.9}})
    want = SIM.semantic_dedup(emb, "vec_id", "embedding", nlist=4,
                              threshold=0.9)
    assert rows(got) == rows(want)

    # nlist "auto" passes through (√N clusters) instead of crashing on
    # int("auto") — r11; equality vs the direct auto call
    got = run(spark, {"from": {"op": "semantic_dedup", "table": "embeddings",
                               "nlist": "auto", "threshold": 0.9}})
    want = SIM.semantic_dedup(emb, "vec_id", "embedding", nlist="auto",
                              threshold=0.9)
    assert rows(got) == rows(want)

    got = run(spark, {"from": {"op": "split", "table": "documents",
                               "weights": {"a": 0.5, "b": 0.5},
                               "salt": "s1"},
                      "select": ["doc_id", "split"]})
    want = docs.withColumn("split", SA.split_label(
        F.col("doc_id"), {"a": 0.5, "b": 0.5}, salt="s1")) \
        .select("doc_id", "split")
    assert rows(got) == rows(want)

    got = run(spark, {"from": {"op": "chunks", "table": "documents",
                               "chunk": 25, "carry": ["source"]}})
    want = DD.chunk_table(docs, "doc_id", "text", chunk=25,
                          extra_cols=("source",))
    assert rows(got) == rows(want)

    got = run(spark, {"from": {"op": "source_overlap",
                               "table": "documents"},
                      "where": {"gte": {"frac_contained": 0.01}}})
    want = DD.source_overlap_matrix(docs, "doc_id", "text", "source") \
        .filter(F.col("frac_contained") >= 0.01)
    assert rows(got) == rows(want)

    q5 = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    got = run(spark, {"from": {"op": "ann_topk", "table": "embeddings",
                               "queries": {"lt": {"vec_id": 20}},
                               "method": "lsh", "k": 3, "n_bits": 8}})
    want = SIM.ann_sign_lsh_topk(q5, emb, "q_id", "q_vec",
                                 "vec_id", "embedding", k=3, n_bits=8)
    assert rows(got) == rows(want)

    got = run(spark, {"from": {"op": "exact_substrings",
                               "table": "documents", "k": 8}})
    want = DD.exact_substring_spans(docs, "doc_id", "text", k=8)
    assert rows(got) == rows(want)

    got = run(spark, {"from": {"op": "cdc_chunks", "table": "documents",
                               "window": 4, "mask": 7}})
    want = DD.cdc_chunk_table(docs, "doc_id", "text", window=4, mask=7)
    assert rows(got) == rows(want)

    from activedata_etl_spark.operators.skew import key_skew_profile
    got = run(spark, {"from": {"op": "skew_profile", "table": "lineitem",
                               "columns": ["l_partkey", "l_suppkey"]}})
    want = key_skew_profile(spark.table("lineitem"),
                            ["l_partkey", "l_suppkey"])
    assert rows(got) == rows(want)


def test_new_extension_ops_front_end_equals_direct(spark, sf_dir):
    """bm25 / knn_graph / priority_sample / temperature_mixture routed
    through the jx from clause equal the direct Python-API call."""
    from activedata_etl_spark.ext import sampling as SA, similarity as SIM
    from activedata_etl_spark.ext import text as TX
    from activedata_etl_spark.io import load_table, register_views
    from activedata_etl_spark.plans.query import run

    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    got = run(spark, {"from": {"op": "bm25", "table": "documents",
                               "terms": ["spark", "vector"], "k": 10}})
    want = TX.bm25_topk(docs, "doc_id", "text", ["spark", "vector"], k=10)
    assert rows(got) == rows(want)

    got = run(spark, {"from": {"op": "knn_graph", "table": "embeddings",
                               "k": 2, "nlist": 4},
                      "where": {"gte": {"cos": 0.0}}})
    want = SIM.knn_graph(emb, "vec_id", "embedding", k=2, nlist=4) \
        .filter("cos >= 0.0")
    assert rows(got) == rows(want)

    got = run(spark, {"from": {"op": "priority_sample",
                               "table": "documents",
                               "weight": "n_chars", "k": 5, "salt": "x"}})
    want = SA.priority_sample(docs, "doc_id", "n_chars", k=5, salt="x")
    assert rows(got) == rows(want)

    got = run(spark, {"from": {"op": "temperature_mixture",
                               "table": "documents", "source": "source",
                               "size": "n_chars", "budget": 50000}})
    want = SA.temperature_mixture(docs, "source", "doc_id", "n_chars",
                                  budget=50000)
    assert rows(got) == rows(want)


def test_winnowing_op_front_end_equals_direct(spark, sf_dir):
    from activedata_etl_spark.ext import dedup as DD
    from activedata_etl_spark.io import load_table, register_views
    from activedata_etl_spark.plans.query import run

    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    got = run(spark, {"from": {"op": "winnowing_pairs",
                               "table": "documents", "min_shared": 1},
                      "where": {"gte": {"shared": 2}}})
    want = DD.winnowing_pairs(docs, "doc_id", "text", min_shared=2)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_edges_cube_over_extension_op(spark, sf_dir):
    """An extension-op from clause composes with the EDGES clause too:
    dense range-domain histogram over winnowing shared-counts — the op
    output enters the same aggregate/domain pipeline as a base table."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import dedup as DD
    from activedata_etl_spark.io import load_table, register_views
    from activedata_etl_spark.plans.query import run

    register_views(spark, sf_dir)
    q = {"from": {"op": "winnowing_pairs", "table": "documents",
                  "min_shared": 1},
         "edges": [{"name": "shared_bin", "value": "shared",
                    "domain": {"type": "range", "min": 1, "max": 9,
                               "interval": 2}}],
         "select": [{"name": "n", "aggregate": "count"}]}
    got = {r["shared_bin"]: r["n"] for r in run(spark, q).collect()}
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.winnowing_pairs(docs, "doc_id", "text", min_shared=1)
    want_rows = (pairs.filter((F.col("shared") >= 1) & (F.col("shared") < 9))
                 .groupBy((F.floor((F.col("shared") - 1) / 2) * 2 + 1)
                          .cast("double").alias("b"))
                 .count().collect())
    want = {r["b"]: r["count"] for r in want_rows}
    for b, n in want.items():
        assert got.get(b, 0) == n, (b, got.get(b), n)
    # dense completion: every bin in [1,9) step 2 is present even if 0
    assert {1.0, 3.0, 5.0, 7.0} <= set(got)


def test_window_and_cube_over_extension_op(spark, sf_dir):
    """The jx window clause and the cube formatter also compose over an
    extension-op from clause — op outputs are full citizens of every
    downstream stage."""
    from pyspark.sql import Window, functions as F

    from activedata_etl_spark.ext import dedup as DD
    from activedata_etl_spark.io import load_table, register_views
    from activedata_etl_spark.plans.query import run, run_formatted

    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")

    # window: rank each doc's matches by shared desc (where precedes
    # window in the jx clause order, so the rank column is compared on
    # the full output)
    got = run(spark, {
        "from": {"op": "winnowing_pairs", "table": "documents",
                 "min_shared": 1},
        "window": [{"name": "rk", "value": "shared", "aggregate": "rank",
                    "edges": ["id_a"],
                    "sort": [{"value": "shared", "sort": -1}]}],
    })
    pairs = DD.winnowing_pairs(docs, "doc_id", "text", min_shared=1)
    w = Window.partitionBy("id_a").orderBy(F.desc("shared"))
    want = pairs.withColumn("rk", F.rank().over(w))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))

    # cube format over an op output
    cube = run_formatted(spark, {
        "from": {"op": "skew_profile", "table": "lineitem",
                 "columns": ["l_partkey"]},
        "edges": ["column"],
        "select": [{"name": "n", "aggregate": "count"}],
        "format": "cube"})
    assert sum(cube["data"]["n"]) >= 1


def test_asof_and_top_component_ops_front_end_equals_direct(spark, sf_dir):
    """asof (backward + tolerance + nearest) and top_component routed
    through the jx from clause equal the direct Python-API calls; the
    nearest direction rejects tolerance/split params."""
    import pytest

    from activedata_etl_spark.ext.similarity import top_component
    from activedata_etl_spark.io import load_table, register_views
    from activedata_etl_spark.operators import joins as J
    from activedata_etl_spark.plans.query import run

    register_views(spark, sf_dir)
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate")

    def rows(df):
        return sorted(map(tuple, df.collect()))

    base = {"op": "asof",
            "table": {"from": "events",
                      "select": ["event_id", "user_id", "ts"]},
            "right": {"from": "orders",
                      "select": ["o_custkey", "o_orderkey", "o_orderdate"]},
            "left_on": "user_id", "right_on": "o_custkey",
            "left_time": "ts", "right_time": "o_orderdate",
            "tiebreak": "o_orderkey", "right_cols": ["o_orderkey"]}
    kw = dict(left_on="user_id", right_on="o_custkey", left_time="ts",
              right_time="o_orderdate", tiebreak="o_orderkey",
              right_cols=["o_orderkey"])

    got = run(spark, {"from": dict(base)})
    want = J.asof_join(e, o, **kw)
    assert rows(got) == rows(want)

    got = run(spark, {"from": dict(base, direction="forward",
                                   tolerance_s=86400 * 30)})
    want = J.asof_join(e, o, **kw, direction="forward",
                       tolerance_s=86400 * 30)
    assert rows(got) == rows(want)

    got = run(spark, {"from": dict(base, direction="nearest")})
    want = J.asof_join_nearest(e, o, **kw)
    assert rows(got) == rows(want)

    with pytest.raises(ValueError, match="nearest"):
        run(spark, {"from": dict(base, direction="nearest",
                                 tolerance_s=60)})
    with pytest.raises(ValueError, match="right_on"):
        run(spark, {"from": {k: v for k, v in base.items()
                             if k != "right_on"}})

    emb = load_table(spark, sf_dir, "embeddings")
    got = run(spark, {"from": {"op": "top_component", "table": "embeddings",
                               "n_iter": 2}})
    comp = top_component(emb, "vec_id", "embedding", n_iter=2)
    from pyspark.sql import functions as F
    want = (comp.select(F.posexplode("vt").alias("pos", "v"), "lam")
            .withColumn("pos", F.col("pos").cast("long")))
    assert rows(got) == rows(want)


def test_pq_op_front_end_equals_direct(spark, sf_dir):
    """ann_topk method="pq" (r10) routed through the jx from clause
    equals ext/pq.pq_topk directly."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import pq as PQ
    from activedata_etl_spark.io import load_table, register_views
    from activedata_etl_spark.plans.query import run

    register_views(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    got = run(spark, {"from": {"op": "ann_topk", "table": "embeddings",
                               "queries": {"lt": {"vec_id": 10}},
                               "method": "pq", "k": 3,
                               "m": 4, "ksub": 8, "dim": 64}})
    want = PQ.pq_topk(emb, emb.filter(F.col("vec_id") < 10),
                      "vec_id", "embedding", k=3, m=4, ksub=8, dim=64)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_pq_rotation_through_jx(spark, sf_dir):
    """ann_topk method="pq" with rotation="pca" + balance_dims (r12
    full-OPQ) routed through the jx from clause equals the direct
    trained-rotation chain."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import pq as PQ
    from activedata_etl_spark.io import load_table, register_views
    from activedata_etl_spark.plans.query import run

    register_views(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    got = run(spark, {"from": {"op": "ann_topk", "table": "embeddings",
                               "queries": {"lt": {"vec_id": 5}},
                               "method": "pq", "k": 3, "m": 4, "ksub": 8,
                               "dim": 64, "balance_dims": True,
                               "rotation": "pca"}})
    want = PQ.pq_topk(emb, emb.filter(F.col("vec_id") < 5),
                      "vec_id", "embedding", k=3, m=4, ksub=8, dim=64,
                      balance_dims=True, rotation="pca")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_meta_columns_survives_dotted_view_names(spark, sf_dir):
    """A catalog-visible view with a literally-dotted column name (the
    dotted-output tests register such views) must not crash the
    unpinned meta.columns scan — r12 full-suite catch: F.col over the
    raw name parsed "n.name" as struct access and every later catalog
    test failed on the leftover view."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.io import load_table, meta_columns, \
        register_views

    register_views(spark, sf_dir)
    (load_table(spark, sf_dir, "nation")
     .select("n_nationkey", F.col("n_name").alias("n.name"))
     .createOrReplaceTempView("nation_dotted_catalog_probe"))
    try:
        got = (meta_columns(spark)
               .filter(F.col("table") == "nation_dotted_catalog_probe")
               .collect())
        assert {r["column"] for r in got} == {"n_nationkey", "n.name"}
        card = {r["column"]: r["cardinality"] for r in got}
        assert card["n.name"] == card["n_nationkey"]
    finally:
        spark.catalog.dropTempView("nation_dotted_catalog_probe")


def test_meta_columns_skips_streaming_views(spark, sf_dir, tmp_path):
    """A leftover readStream-backed temp view must not taint the
    meta.columns union as streaming (r12 full-suite catch #2: the
    UnsupportedOperationChecker rejects a batch collect over ANY plan
    containing a streaming source, even one a pinned filter would
    prune)."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.io import meta_columns, register_views

    register_views(spark, sf_dir)
    inbox = str(tmp_path / "inbox")
    spark.range(3).selectExpr("id", "CAST(id AS STRING) AS s") \
        .write.parquet(inbox)
    schema = spark.read.parquet(inbox).schema
    (spark.readStream.schema(schema).parquet(inbox)
     .createOrReplaceTempView("stream_probe_view"))
    try:
        got = meta_columns(spark)
        assert not got.isStreaming
        tabs = {r["table"] for r in got.select("table").distinct()
                .collect()}
        assert "stream_probe_view" not in tabs and "nation" in tabs
    finally:
        spark.catalog.dropTempView("stream_probe_view")


def test_meta_tables_jx_queryable(spark, sf_dir):
    """{"from": "meta.tables"} serves the catalog through the ordinary
    jx pipeline (r12 — the reference's queryable meta containers)."""
    from activedata_etl_spark.io import TABLES, register_views
    from activedata_etl_spark.plans.query import run

    register_views(spark, sf_dir)
    got = run(spark, {"from": "meta.tables",
                      "where": {"in": {"table": sorted(TABLES)}}})
    rows_ = {r["table"]: (r["type"], r["is_temporary"])
             for r in got.collect()}
    assert set(rows_) == set(TABLES)
    assert all(t == "temporary" and tmp for t, tmp in rows_.values())


def test_meta_columns_jx_pinned_table_prunes_others(spark, sf_dir):
    """A table-pinned meta.columns query must (a) return exactly that
    table's catalog and (b) NOT scan any other table: the eq filter
    pushes through the catalog union, folds each child's literal table
    name, and PropagateEmptyRelation removes the other children — the
    scalable shape for a 1000-table catalog."""
    from activedata_etl_spark.io import describe_columns, load_table, \
        register_views
    from activedata_etl_spark.plans.query import run

    register_views(spark, sf_dir)
    got = run(spark, {"from": "meta.columns",
                      "where": {"eq": {"table": "nation"}}})
    want = {(r["column"], r["dtype"], r["cardinality"], r["n_nulls"])
            for r in describe_columns(
                load_table(spark, sf_dir, "nation")).collect()}
    assert {(r["column"], r["dtype"], r["cardinality"], r["n_nulls"])
            for r in got.collect()} == want and want
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "nation" in plan
    for other in ("lineitem", "orders", "documents", "embeddings"):
        assert other not in plan, f"pinned query must not scan {other}"


def test_meta_columns_unpinned_catalogs_everything(spark, sf_dir):
    """The unpinned form really is the full catalog: one row per
    (table, column) across all ten base tables."""
    from activedata_etl_spark.io import TABLES, load_table, register_views
    from activedata_etl_spark.plans.query import run

    register_views(spark, sf_dir)
    got = (run(spark, {"from": "meta.columns",
                       "where": {"in": {"table": sorted(TABLES)}}})
           .collect())
    per_table = {}
    for r in got:
        per_table.setdefault(r["table"], set()).add(r["column"])
    assert set(per_table) == set(TABLES)
    for t in TABLES:
        assert per_table[t] == set(
            load_table(spark, sf_dir, t).columns)

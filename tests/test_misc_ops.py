"""Unit tests: date literals, jsonl source, skew helpers, `one` aggregate."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from activedata_etl_spark.functions.aggs import one
from activedata_etl_spark.functions.dates import parse_date
from activedata_etl_spark.io import load_table
from activedata_etl_spark.operators.skew import salted_join
from activedata_etl_spark.sources.jsonl import read_jsonl, write_jsonl

NOW = dt.datetime(2018, 5, 16, 14, 30, 45)  # a Wednesday


def test_parse_date_anchors():
    assert parse_date("now", NOW) == NOW
    assert parse_date("today", NOW) == dt.datetime(2018, 5, 16)
    assert parse_date("eod", NOW) == dt.datetime(2018, 5, 17)
    assert parse_date("week", NOW) == dt.datetime(2018, 5, 13)  # Sunday start
    assert parse_date("month", NOW) == dt.datetime(2018, 5, 1)
    assert parse_date("year", NOW) == dt.datetime(2018, 1, 1)


def test_parse_date_offsets():
    assert parse_date("today-week", NOW) == dt.datetime(2018, 5, 9)
    assert parse_date("today-2day", NOW) == dt.datetime(2018, 5, 14)
    assert parse_date("month-3month", NOW) == dt.datetime(2018, 2, 1)
    # calendar-aware month arithmetic clamps to month end
    assert parse_date("month-3month", dt.datetime(2018, 5, 31)) == dt.datetime(2018, 2, 1)
    assert parse_date("year+year", NOW) == dt.datetime(2019, 1, 1)
    assert parse_date("2018-01-01", NOW) == dt.datetime(2018, 1, 1)
    assert parse_date(86400) == dt.datetime(1970, 1, 2)


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    n = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "blocks")
    write_jsonl(n, path, gzip=True)
    back = read_jsonl(spark, path, schema=n.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, n.collect()))


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    plain = li.join(o, "l_orderkey").count()
    salted = salted_join(li, o, "l_orderkey", salt=8).count()
    assert plain == salted


def test_one_aggregate(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    # single-valued per group: region key per nation name
    ok = n.groupBy("n_name").agg(one("n_regionkey").alias("rk")).count()
    assert ok == 25
    # multi-valued group errors out
    with pytest.raises(Exception, match="one"):
        n.groupBy("n_regionkey").agg(one("n_name").alias("x")).collect()


def test_asof_join_edges(spark):
    from activedata_etl_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 5, "b"), (2, 7, "c"), (None, 9, "d"), (3, None, "e")],
        "k int, t int, lbl string",
    )
    right = spark.createDataFrame(
        # k=1: two rows tied at t=5 -> tiebreak picks rid=12; k=9 never matches
        [(1, 5, 11, "x"), (1, 5, 12, "y"), (1, 8, 13, "z"),
         (2, 9, 14, "late"), (None, 1, 15, "nullk"), (9, 1, 16, "nok")],
        "k int, t int, rid int, val string",
    )
    out = asof_join(left, right, "k", "k", "t", "t",
                    tiebreak="rid", right_cols=["rid", "val"])
    got = {r.lbl: (r.rid, r.val) for r in out.collect()}
    assert got == {
        "a": (13, "z"),      # latest t<=10 is t=8
        "b": (12, "y"),      # tie at t=5 -> max rid wins
        "c": (None, None),   # right row at t=9 > 7: no match
        "d": (None, None),   # NULL key never matches (even vs NULL-key right)
        "e": (None, None),   # NULL time matches nothing
    }
    assert out.count() == 5  # every left row survives (LEFT semantics)


def test_pruned_percentiles_match_sorted(spark, sf_dir):
    """Grouped pruned path must equal the exact sort path bit-for-bit."""
    from activedata_etl_spark.functions import aggs as A
    from activedata_etl_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    ps = {"p50": 0.5, "p95": 0.95}
    a = A.pruned_percentiles(li, ["l_returnflag"], "l_extendedprice", ps)
    b = A.sorted_percentiles(li, ["l_returnflag"], "l_extendedprice", ps)
    ra = {r["l_returnflag"]: (r["p50"], r["p95"]) for r in a.collect()}
    rb = {r["l_returnflag"]: (r["p50"], r["p95"]) for r in b.collect()}
    assert ra == rb


def test_pruned_percentiles_fallback_is_exact(spark, sf_dir):
    """delta=0 collapses the bracket so verification fails → the sort
    fallback must kick in and still return the exact answer."""
    from activedata_etl_spark.functions import aggs as A
    from activedata_etl_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    ps = {"med": 0.5}
    a = A.pruned_percentiles(li, [], "l_quantity", ps, delta=0.0, accuracy=10)
    b = A.sorted_percentiles(li.withColumn("__g__", F.lit(1)),
                             ["__g__"], "l_quantity", ps)
    assert a.collect()[0]["med"] == b.collect()[0]["med"]


def test_pruned_percentiles_group_cap_routes_to_sort(spark, sf_dir,
                                                     monkeypatch):
    """VERDICT r5 #4: the per-group bracket-verification collect is the
    engine's last driver materialization bounded only by convention — a
    high-cardinality key must route AWAY from it (to the per-group sort
    strategy) by contract, and still be exact."""
    from activedata_etl_spark.functions import aggs as A
    from activedata_etl_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    ps = {"med": 0.5}
    taken = {}
    real = A.sorted_percentiles

    def spy(*a, **k):
        taken["fallback"] = True
        return real(*a, **k)

    monkeypatch.setattr(A, "sorted_percentiles", spy)
    monkeypatch.setattr(A, "MAX_PRUNED_GROUPS", 3)  # l_suppkey ≫ 3 groups
    a = A.pruned_percentiles(li, ["l_suppkey"], "l_quantity", ps)
    assert taken.get("fallback"), "high-cardinality key must not collect"
    b = real(li, ["l_suppkey"], "l_quantity", ps)
    ra = {r["l_suppkey"]: r["med"] for r in a.collect()}
    rb = {r["l_suppkey"]: r["med"] for r in b.collect()}
    assert ra == rb
    # under the cap, the pruned path still runs (no spurious fallback)
    taken.clear()
    monkeypatch.setattr(A, "MAX_PRUNED_GROUPS", 10_000)
    A.pruned_percentiles(li, ["l_returnflag"], "l_quantity", ps)
    assert "fallback" not in taken


def test_leaf_paths_depth3():
    from pyspark.sql import types as T
    from activedata_etl_spark.operators.nested import leaf_paths

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("a", T.StructType([
            T.StructField("b", T.StructType([
                T.StructField("c", T.StringType()),
                T.StructField("d", T.DoubleType()),
            ])),
            T.StructField("e", T.StringType()),
            T.StructField("arr", T.ArrayType(T.LongType())),  # arrays are not leaves
        ])),
    ])
    assert leaf_paths(schema) == ["id", "a.b.c", "a.b.d", "a.e"]


def test_deep_from_two_hop_carries_parents(spark):
    from pyspark.sql import functions as F
    from activedata_etl_spark.plans import query as JXQ

    df = spark.createDataFrame(
        [(1, [(10, [(100,), (101,)]), (11, [(110,)])]), (2, [(20, [(200,)])])],
        "pid bigint, kids array<struct<kid bigint, grand array<struct<gid bigint>>>>")
    df.createOrReplaceTempView("deep_t")
    out = JXQ.run(spark, {"from": "deep_t.kids.grand",
                          "select": ["pid", "kid", "gid"]})
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [(1, 10, 100), (1, 10, 101), (1, 11, 110), (2, 20, 200)]


def test_exact_percentile_frame_guard(spark):
    """An unbounded frame over a partition larger than max_frame_rows
    must fail the job with the guard's message, not melt the executor."""
    import pytest
    from pyspark.sql import Window, functions as F
    from activedata_etl_spark.operators import windows as W

    df = spark.range(200).select((F.col("id") % 2).alias("g"),
                                 F.col("id").cast("double").alias("v"))
    w = W.running(Window.partitionBy("g").orderBy("v"))
    guarded = df.withColumn("p", W.exact_percentile_over("v", w, 0.5,
                                                         max_frame_rows=50))
    with pytest.raises(Exception, match="max_frame_rows"):
        guarded.collect()
    # within the bound the same plan computes
    ok = df.withColumn("p", W.exact_percentile_over("v", w, 0.5,
                                                    max_frame_rows=200))
    assert ok.count() == 200


def test_rolling_mad_flags_injected_spike(spark):
    from activedata_etl_spark.operators import windows as W
    from pyspark.sql import Window

    # steady series with one 100x spike: only the spike is anomalous
    rows = [(i, 1, float(10 + (i % 3))) for i in range(30)]
    rows[20] = (20, 1, 1000.0)
    df = spark.createDataFrame(rows, "event_id: long, user_id: long, value: double")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-19, 0)
    med, mad = W.rolling_median_mad("value", w)
    out = (df.select("event_id", "value", med.alias("med"), mad.alias("mad"))
           .withColumn("anom", F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"))
           .collect())
    flagged = {r["event_id"] for r in out if r["anom"]}
    assert 20 in flagged and len(flagged) <= 2  # spike + at most edge noise
    # guard fires on unbounded frames over a big partition
    big = spark.range(200).select(
        F.lit(1).alias("k"), F.col("id").cast("double").alias("v"))
    wu = Window.partitionBy("k").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    m2, _ = W.rolling_median_mad("v", wu, max_frame_rows=50)
    with pytest.raises(Exception, match="max_frame_rows"):
        big.select(m2.alias("m")).collect()


def test_ewma_int_known_values(spark):
    from activedata_etl_spark.operators import windows as W
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 4.0)], "t: long, value: double")
    w = Window.partitionBy().orderBy("t").rowsBetween(-19, 0)
    got = [r["e"] for r in
           df.select("t", W.ewma_int("value", w).alias("e")).orderBy("t").collect()]
    # weights 2^(i-1), newest heaviest: [1, (1+2*2)/3, (1+2*2+4*4)/7]
    assert got == [1.0, 5.0 / 3.0, 3.0]


def test_bloom_prefilter_reduces_probe_and_never_drops_matches(spark, sf_dir):
    from activedata_etl_spark.io import load_table
    from activedata_etl_spark.operators.joins import bloom_prefilter

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 1)
    keys = p.select("p_partkey")
    reduced = bloom_prefilter(li, keys, "l_partkey", "p_partkey")
    n_all, n_kept = li.count(), reduced.count()
    n_true = li.join(keys, li.l_partkey == keys.p_partkey, "left_semi").count()
    # every true match survives (no false negatives) ...
    assert n_kept >= n_true
    # ... and the reduction is real (sf fixtures: p_size=1 is ~2% of parts)
    assert n_kept < n_all * 0.2
    # exact join on the reduced side == exact join on the full side
    assert (reduced.join(p, reduced.l_partkey == p.p_partkey).count()
            == li.join(p, li.l_partkey == p.p_partkey).count())


def test_bloom_prefilter_cross_dtype_keys(spark):
    """xxhash64 is type-sensitive: without key canonicalization, an int
    probe key vs a bigint build key hashes to different bits and EVERY
    true match dies at the prefilter (silent false negatives)."""
    from activedata_etl_spark.operators.joins import bloom_prefilter

    probe = spark.createDataFrame([(i,) for i in range(100)], "k: int")
    build = spark.createDataFrame([(i,) for i in range(0, 100, 10)], "k: long")
    kept = {r["k"] for r in
            bloom_prefilter(probe, build, "k", "k").collect()}
    assert set(range(0, 100, 10)) <= kept  # no false negatives across dtypes


def test_bloom_probe_duplicate_probe_keys_stay_one_sided(spark):
    """ADVICE r4: a probe key appearing k>1 times contributes k*N_HASHES
    exploded rows to its group; comparing sum(hit) against the CONSTANT
    N_HASHES reported present keys as definitely-absent — a one-sided
    guarantee violation. The fix compares sum==count per group."""
    from activedata_etl_spark.functions import bloom

    members = spark.createDataFrame([(i,) for i in range(50)], "k: long")
    filt = bloom.bloom_build(members, [], "k")
    # present key 7 duplicated 3x, absent key 999 duplicated 2x
    probes = spark.createDataFrame(
        [(7,), (7,), (7,), (11,), (999,), (999,)], "k: long")
    got = {r["k"]: r["maybe_present"]
           for r in bloom.bloom_probe(filt, probes, [], "k").collect()}
    assert got[7] is True     # present, duplicated — MUST stay present
    assert got[11] is True    # present, unique
    assert len(got) == 3      # one output row per distinct probe key


def test_asof_hotkey_split_equivalence(spark):
    """split_hot_keys must be result-invisible under planted skew: one
    celebrity key owns most rows, matches cross split boundaries (some
    splits have no right rows at all), and the stitched result equals
    the unsplit scan in every direction/tolerance variant."""
    import random

    from activedata_etl_spark.operators.joins import asof_join

    rng = random.Random(7)
    # hot key 0: 2000 left rows, right rows only in the first tenth of
    # the time domain → later splits depend entirely on the carried
    # boundary payload; cold keys 1..20 sparse throughout
    left = [(0, float(rng.randrange(0, 10_000))) for _ in range(2000)] + [
        (k, float(rng.randrange(0, 10_000)))
        for k in range(1, 21) for _ in range(5)]
    right = [(0, float(rng.randrange(0, 1_000)), i) for i in range(40)] + [
        (k, float(rng.randrange(0, 10_000)), 100 + k * 7 + j)
        for k in range(1, 21) for j in range(3)]
    ldf = spark.createDataFrame(left, "k: long, t: double")
    rdf = spark.createDataFrame(right, "k: long, t: double, payload: long")

    for kwargs in ({}, {"direction": "forward"}, {"tolerance_s": 500.0}):
        plain = asof_join(ldf, rdf, "k", "k", "t", "t", tiebreak="payload",
                          right_cols=["payload"], **kwargs)
        split = asof_join(ldf, rdf, "k", "k", "t", "t", tiebreak="payload",
                          right_cols=["payload"], split_hot_keys=8, **kwargs)
        key = lambda rows: sorted((r["k"], r["t"], r["payload"]) for r in rows)
        assert key(split.collect()) == key(plain.collect()), kwargs


def test_asof_nearest_edges(spark):
    """Nearest as-of tie rules: equidistant opposite sides -> backward;
    equal-time dups within a side -> that side's native tiebreak; NULL
    key/time never match; LEFT semantics."""
    from activedata_etl_spark.operators.joins import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 10, "equi"),      # right at 8 and 12: equidistant -> backward (8)
         (1, 3, "fwd_only"),   # nearest is 5... wait both sides exist
         (2, 7, "tie_dup"),    # two right rows AT t=7 -> backward, max rid
         (2, 100, "far_b"),    # only backward side candidates
         (3, 1, "fwd"),        # right only at t=4 (forward)
         (None, 9, "nullk"), (4, None, "nullt")],
        "k int, t int, lbl string",
    )
    right = spark.createDataFrame(
        [(1, 8, 21, "b8"), (1, 12, 22, "f12"),
         (1, 5, 23, "b5"),
         (2, 7, 24, "t7a"), (2, 7, 25, "t7b"),
         (3, 4, 26, "f4"),
         (None, 1, 27, "nullk"), (9, 1, 28, "nok")],
        "k int, t int, rid int, val string",
    )
    out = asof_join_nearest(left, right, "k", "k", "t", "t",
                            tiebreak="rid", right_cols=["rid", "val"])
    got = {r.lbl: (r.rid, r.val) for r in out.collect()}
    assert got == {
        "equi": (21, "b8"),     # |10-8| == |12-10| -> backward wins
        "fwd_only": (23, "b5"), # nearest overall is t=5 (forward side of t=3)
        "tie_dup": (25, "t7b"), # exact-time dup -> backward side, max rid
        "far_b": (25, "t7b"),   # only backward candidates: latest<=100 is the
                                # t=7 pair -> backward tie rule, max rid
        "fwd": (26, "f4"),
        "nullk": (None, None),
        "nullt": (None, None),
    }
    assert out.count() == 7


def test_describe_columns_refresh_all_null_and_no_audit(spark):
    """Catalog-refresh review findings: an all-NULL column keeps its
    catalog row (left join; register fields NULL), and exact_audit=False
    drops the distinct shuffle (exact_ndv NULL) — the 100 TB form."""
    from activedata_etl_spark.io import describe_columns_refresh

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "a bigint, b string")
    rows = {r["column"]: r for r in describe_columns_refresh(df).collect()}
    assert set(rows) == {"a", "b"}
    b = rows["b"]
    assert b["n_rows"] == 3 and b["n_nulls"] == 3 and b["exact_ndv"] == 0
    assert b["raw_est"] is None and b["n_buckets"] is None
    a = rows["a"]
    assert a["exact_ndv"] == 3 and a["raw_est"] is not None
    no_audit = {r["column"]: r for r in
                describe_columns_refresh(df, exact_audit=False).collect()}
    assert no_audit["a"]["exact_ndv"] is None
    assert no_audit["a"]["raw_est"] is not None


def test_describe_columns_nested_paths(spark):
    """Nested-path catalog (r8 verdict missing #2): struct leaves are
    dotted paths at depth 0, array-of-struct leaves count at element
    multiplicity with depth 1, array-in-array counts at depth 2, a
    missing array contributes no elements, null ELEMENTS count as nulls,
    and an everywhere-empty leaf keeps its catalog row with zero counts."""
    from activedata_etl_spark.io import describe_columns_nested

    df = spark.createDataFrame(
        [
            (1, ("x", 1.5), [(10, [1, 2])], []),
            (2, ("y", None), [(None, []), (20, [2, None])], []),
            (3, (None, 2.5), None, []),
        ],
        "id bigint, info struct<s:string,d:double>, "
        "items array<struct<k:int,tags:array<bigint>>>, empty array<int>")
    rows = {r["column"]: r for r in describe_columns_nested(df).collect()}
    assert set(rows) == {"id", "info.s", "info.d", "items.k",
                         "items.tags", "empty"}
    assert (rows["id"]["nested_depth"], rows["id"]["cardinality"],
            rows["id"]["n_nulls"], rows["id"]["n_values"]) == (0, 3, 0, 3)
    assert (rows["info.s"]["cardinality"], rows["info.s"]["n_nulls"]) == (2, 1)
    assert rows["info.d"]["dtype"] == "double"
    # items.k: elements (10), (NULL, 20) -> 2 distinct, 1 null element,
    # 2 values; row 3's missing array contributes nothing
    k = rows["items.k"]
    assert (k["nested_depth"], k["cardinality"], k["n_nulls"],
            k["n_values"]) == (1, 2, 1, 2)
    # items.tags: depth-2 leaf, elements [1,2] + [] + [2,None]
    t = rows["items.tags"]
    assert (t["nested_depth"], t["cardinality"], t["n_nulls"],
            t["n_values"]) == (2, 2, 1, 3)
    # everywhere-empty array keeps its row with zero counts
    e = rows["empty"]
    assert (e["nested_depth"], e["cardinality"], e["n_nulls"],
            e["n_values"]) == (1, 0, 0, 0)


def test_resample_gap_fill_semantics(spark):
    """resample + fills on a hand-built series: bucket means, dense
    per-key grid bounded by each key's own span, LOCF carry, linear
    interpolation across a 2-bucket interior gap, and the span cap."""
    import datetime as dt

    from activedata_etl_spark.operators import timeseries as TS

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 10), 10.0),
        ("a", dt.datetime(2024, 1, 1, 0, 50), 20.0),   # same bucket -> mean 15
        ("a", dt.datetime(2024, 1, 1, 3, 0), 45.0),    # 2-bucket gap
        ("b", dt.datetime(2024, 1, 1, 5, 0), 1.0),     # single-obs key
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    grid = TS.resample(df, "ts", "value", ["k"], step_sec=3600)
    out = grid.select(
        "k", "t", "v",
        TS.fill_locf(["k"]).alias("locf"),
        TS.fill_linear(["k"]).alias("lerp")).collect()
    byk = {}
    for r in out:
        byk.setdefault(r["k"], []).append(r)
    a = sorted(byk["a"], key=lambda r: r["t"])
    assert [r["v"] for r in a] == [15.0, None, None, 45.0]
    assert [r["locf"] for r in a] == [15.0, 15.0, 15.0, 45.0]
    assert [r["lerp"] for r in a] == [15.0, 25.0, 35.0, 45.0]
    assert [ (r["v"], r["locf"], r["lerp"]) for r in byk["b"] ] == \
        [(1.0, 1.0, 1.0)]

    import pytest as _pytest
    # the span cap is IN-PLAN (assert_true): construction stays
    # job-free, the violation surfaces when the grid executes
    capped = TS.resample(df, "ts", "value", ["k"], step_sec=1,
                         max_buckets=100)
    with _pytest.raises(Exception, match="max_buckets"):
        capped.collect()


def test_describe_columns_nested_register_ndv(spark):
    """exact=False: per-leaf NDV from HLL registers — no distinct
    shuffle; raw_est replaces cardinality, within the raw-regime
    envelope of the exact count; an all-empty leaf keeps its row with
    raw_est NULL."""
    from activedata_etl_spark.io import describe_columns_nested

    df = spark.range(500).selectExpr(
        "id", "struct(cast(id % 37 as string) AS s) AS info",
        "array(struct(id % 11 AS k)) AS items",
        "CAST(array() AS array<int>) AS empty")
    exact = {r["column"]: r for r in describe_columns_nested(df).collect()}
    approx = {r["column"]: r
              for r in describe_columns_nested(df, exact=False).collect()}
    assert set(approx) == set(exact)
    import math

    for col in ("id", "info.s", "items.k"):
        e = exact[col]["cardinality"]
        r = approx[col]
        a = r["raw_est"]
        # the hll_estimate consumer contract: linear counting in the
        # low-cardinality regime (n_buckets = OCCUPIED buckets;
        # m = occupied + zero)
        m = r["n_buckets"] + r["n_zero"]
        if a < 2.5 * m and r["n_zero"] > 0:
            a = m * math.log(m / r["n_zero"])
        assert abs(a - e) / e < 0.25, (col, e, a)
        assert approx[col]["n_values"] == exact[col]["n_values"]
    assert approx["empty"]["raw_est"] is None
    assert approx["empty"]["n_values"] == 0

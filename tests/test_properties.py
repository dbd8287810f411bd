"""Property-based tests (hypothesis) for the jx semantics kit.

The reference has no randomized testing (SURVEY.md §5.1). These check the
jx null/arithmetic laws against a pure-Python executable spec on arbitrary
inputs — one Spark job per property batch (rows = generated cases), not
one job per case.
"""

import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from activedata_etl_spark.functions import jx
from activedata_etl_spark.functions.dates import parse_date

nums = st.one_of(st.none(), st.integers(-10**6, 10**6),
                 st.floats(-1e6, 1e6, allow_nan=False, width=64))


def _run_cases(spark, cases, build_cols):
    """Evaluate Column expressions over all cases in ONE Spark job."""
    def f(x):
        return float(x) if x is not None else None

    df = spark.createDataFrame(
        [(i, f(a), f(b)) for i, (a, b) in enumerate(cases)],
        "i long, a double, b double")
    rows = df.select("i", "a", "b", *build_cols()).orderBy("i").collect()
    return rows


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(nums, nums), min_size=1, max_size=40))
def test_jx_arith_null_laws(spark, pairs):
    rows = _run_cases(spark, pairs, lambda: [
        jx.add("a", "b").alias("add"),
        jx.mult("a", "b").alias("mult"),
        jx.eq("a", "b").alias("eq"),
        jx.ne("a", "b").alias("ne"),
        jx.min_("a", "b").alias("mn"),
        jx.max_("a", "b").alias("mx"),
    ])
    for r in rows:
        a, b = r["a"], r["b"]
        present = [x for x in (a, b) if x is not None]
        # add/mult ignore missing; all-missing → missing
        if not present:
            assert r["add"] is None and r["mult"] is None
        else:
            assert math.isclose(r["add"], sum(present), rel_tol=1e-9)
            p = 1.0
            for x in present:
                p *= x
            assert math.isclose(r["mult"], p, rel_tol=1e-9)
            assert r["mn"] == min(present) and r["mx"] == max(present)
        # eq is null-safe; ne needs both present
        assert r["eq"] == (a == b or (a is None and b is None))
        assert r["ne"] == (a is not None and b is not None and a != b)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.floats(-1e6, 1e6, allow_nan=False),
                          st.integers(-1000, 1000)), min_size=1, max_size=40))
def test_jx_div_mod_laws(spark, pairs):
    df_rows = _run_cases(spark, pairs, lambda: [
        jx.div("a", "b").alias("div"),
        F.when(F.col("b") != 0, jx.mod(F.col("b").cast("bigint"), 7)).alias("mod7"),
    ])
    for r in df_rows:
        a, b = r["a"], r["b"]
        if b == 0:
            assert r["div"] is None  # never an error
        else:
            assert math.isclose(r["div"], a / b, rel_tol=1e-9)
            assert r["mod7"] == int(b) % 7  # floored, Python convention


@settings(max_examples=50, deadline=None)
@given(st.datetimes(min_value=__import__("datetime").datetime(1971, 1, 1),
                    max_value=__import__("datetime").datetime(2100, 1, 1)))
def test_parse_date_anchor_laws(now):
    day = parse_date("today", now)
    assert day <= now and (now - day).total_seconds() < 86400
    wk = parse_date("week", now)
    assert wk.weekday() == 6 or (wk.weekday() == 6)  # Sunday
    assert wk <= day and (day - wk).days < 7
    assert parse_date("month", now).day == 1
    assert parse_date("today-week", now) == day - __import__("datetime").timedelta(days=7)
    # month arithmetic is its own inverse on month floors
    mf = parse_date("month", now)
    assert parse_date("month-3month+3month", now) == mf


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.sampled_from("abc"),
                          st.integers(0, 50),        # value
                          st.integers(1, 9)),        # weight
                min_size=1, max_size=60),
       st.sampled_from([0.1, 0.5, 0.9]))
def test_weighted_percentile_matches_brute_force(spark, rows, p):
    """weighted_percentiles == the executable spec: walk values in order,
    return the first whose cumulative weight reaches p·total."""
    from activedata_etl_spark.functions.aggs import weighted_percentiles

    df = spark.createDataFrame(rows, "k string, v long, w long")
    got = {r["k"]: r["wp"] for r in
           weighted_percentiles(df, ["k"], "v", "w", {"wp": p}).collect()}

    by_key = {}
    for k, v, w in rows:
        by_key.setdefault(k, {}).setdefault(v, 0)
        by_key[k][v] += w
    for k, hist in by_key.items():
        total = sum(hist.values())
        cum, expect = 0, None
        for v in sorted(hist):
            cum += hist[v]
            if cum >= p * total:
                expect = v
                break
        assert got[k] == expect, (k, p, hist, got[k], expect)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=60,
                unique=True),
       st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=60,
                unique=True))
def test_bloom_prefilter_never_false_negative(spark, build, probe):
    """Bloom's one-sided error, on arbitrary keys: every probe key that
    IS in the build set must survive the prefilter."""
    from activedata_etl_spark.operators.joins import bloom_prefilter

    b = spark.createDataFrame([(k,) for k in build], "k: long")
    p = spark.createDataFrame([(k,) for k in probe], "pk: long")
    kept = {r["pk"] for r in
            bloom_prefilter(p, b, "pk", "k", n_bits=1 << 10).collect()}
    assert set(probe) & set(build) <= kept


@settings(max_examples=15, deadline=None)
@given(st.lists(st.decimals(min_value=-1000, max_value=1000, places=3),
                min_size=1, max_size=25))
def test_ewma_int_matches_sequential_spec(spark, vals):
    """The closed-form integer EWMA equals the sequential recurrence
    truncated at the frame horizon, computed in exact Fractions."""
    from fractions import Fraction
    from pyspark.sql import Window
    from activedata_etl_spark.operators import windows as W

    xs = [float(v) for v in vals]
    df = spark.createDataFrame(list(enumerate(xs)), "t: long, value: double")
    w = Window.partitionBy().orderBy("t").rowsBetween(-19, 0)
    got = [r["e"] for r in
           df.select("t", W.ewma_int("value", w).alias("e")).orderBy("t").collect()]
    for i in range(len(xs)):
        lo = max(0, i - 19)
        weights = [Fraction(1, 2 ** (i - j)) for j in range(lo, i + 1)]
        spec = (sum(wt * Fraction(str(round(x, 6)))
                    for wt, x in zip(weights, xs[lo:i + 1]))
                / sum(weights))
        assert math.isclose(got[i], float(spec), rel_tol=0, abs_tol=1e-9), \
            (i, got[i], float(spec))


def test_exact_substring_spans_matches_python_reference(spark):
    """exact_substring_spans vs a brute-force Python reference over a
    deterministic battery of small corpora (every window enumerated,
    duplicated positions unioned literally) — pins the merged-interval
    fold beyond the hand-built golden."""
    import itertools
    import random

    from activedata_etl_spark.ext.dedup import exact_substring_spans

    rng = random.Random(11)
    K = 3
    corpora = []
    for trial in range(6):
        docs = []
        for d in range(1, 5):
            n = rng.randrange(0, 14)
            docs.append((d, " ".join(
                f"t{rng.randrange(4)}" for _ in range(n)) if n else "x"))
        corpora.append(docs)

    for docs in corpora:
        toks = {d: t.split() for d, t in docs}
        wins = {}  # hash key (tuple of tokens) -> [(d, p)]
        for d, ts in toks.items():
            for p in range(1, len(ts) - K + 2):
                wins.setdefault(tuple(ts[p - 1:p - 1 + K]), []).append((d, p))
        want = {}
        for d, ts in toks.items():
            covered = set()
            dup_ws = 0
            for p in range(1, len(ts) - K + 2):
                if len(wins[tuple(ts[p - 1:p - 1 + K])]) >= 2:
                    dup_ws += 1
                    covered.update(range(p, p + K))
            spans = 0
            for i in sorted(covered):
                if i - 1 not in covered:
                    spans += 1
            want[d] = (len(ts), max(len(ts) - K + 1, 0), dup_ws,
                       len(covered), spans)
        df = spark.createDataFrame(docs, "doc_id: long, text: string")
        got = {r["doc_id"]: (r["n_tokens"], r["n_windows"],
                             r["n_dup_windows"], r["covered_tokens"],
                             r["n_spans"])
               for r in exact_substring_spans(
                   df, "doc_id", "text", k=K).collect()}
        assert got == want, (docs, got, want)


def test_bm25_matches_python_reference(spark):
    """Property: ext/text.bm25_topk equals a direct Python evaluation of
    the documented integer rational (A·tf·(2N−2df+1)·total over
    (2df+1)·(1000·tf·total+B1·total+B2·dl·N), floor-1e6 summed) on
    random corpora — pins the Column implementation to the formula."""
    import math
    import random

    from activedata_etl_spark.ext.text import bm25_topk

    rnd = random.Random(20260814)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    for _ in range(5):
        docs = [(i, " ".join(rnd.choices(vocab, k=rnd.randint(1, 12))))
                for i in range(rnd.randint(3, 10))]
        terms = rnd.sample(vocab, k=2)
        df_ = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {r["doc_id"]: r["bm25"]
               for r in bm25_topk(df_, "doc_id", "text", terms,
                                  k=len(docs)).collect()}

        toks = {i: t.split() for i, t in docs}
        N = len(docs)
        total = sum(len(v) for v in toks.values())
        tf = {(i, w): toks[i].count(w) for i in toks for w in terms
              if w in toks[i]}
        dfreq = {w: sum(1 for i in toks if toks[i].count(w)) for w in terms}
        want = {}
        for i in toks:
            s = 0
            for w in terms:
                t = tf.get((i, w), 0)
                if not t:
                    continue
                num = 2200 * t * (2 * N - 2 * dfreq[w] + 1) * 1.0 * total
                den = (2 * dfreq[w] + 1) * 1.0 * (
                    1000 * t * total + 300 * total + 900 * len(toks[i]) * N)
                s += math.floor(num / den * 1e6)
            if s:
                want[i] = s / 1e6
        for i, v in want.items():
            assert got[i] == v, (i, got[i], v)


def test_priority_sample_matches_python_reference(spark, sf_dir):
    """Property: priority_sample equals a direct Python evaluation of
    the documented DLT construction (md5-uniform, w·2^32/(h+1), top-k,
    τ = (k+1)-th, est = max(w, τ)) across salts and k."""
    import hashlib

    from activedata_etl_spark.ext.sampling import priority_sample
    from activedata_etl_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    rows = [(r["doc_id"], r["n_chars"])
            for r in d.select("doc_id", "n_chars").collect()]
    for salt, k in (("s1", 5), ("s2", 12), ("", 3)):
        got = [(r["doc_id"], r["n_chars"], r["priority"], r["est_weight"])
               for r in priority_sample(d, "doc_id", "n_chars",
                                        k=k, salt=salt).collect()]
        prio = []
        for i, w in rows:
            h = int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8], 16)
            prio.append((i, w, (w * 4294967296) / (h + 1)))
        prio.sort(key=lambda t: (-t[2], t[0]))
        tau = prio[k][2]
        want = [(i, w, p, max(float(w), tau)) for i, w, p in prio[:k]]
        assert sorted(got) == sorted(want), (salt, k)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 40 * 3600), st.integers(-1000, 1000)),
                min_size=1, max_size=25))
def test_resample_fills_match_pure_spec(spark, obs):
    """resample + LOCF/lerp vs a pure-Python spec on arbitrary series:
    bucket means (integer values → the decimal mean is exact), dense
    grid bounded by the key's own span, carry-forward, and interpolation
    with the same IEEE expression order."""
    import datetime as dt

    from activedata_etl_spark.operators import timeseries as TS

    base = int(dt.datetime(2024, 1, 6, tzinfo=dt.timezone.utc).timestamp())
    rows = [("k", dt.datetime.fromtimestamp(base + off, dt.timezone.utc)
             .replace(tzinfo=None), float(v)) for off, v in obs]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    grid = TS.resample(df, "ts", "value", ["k"], step_sec=3600)
    got = {r["t"]: (r["v"], r["locf"], r["lerp"]) for r in grid.select(
        "t", "v",
        TS.fill_locf(["k"]).alias("locf"),
        TS.fill_linear(["k"]).alias("lerp")).collect()}

    # pure spec
    from collections import defaultdict
    bk = defaultdict(list)
    for off, v in obs:
        t = base + off
        bk[(t // 3600) * 3600].append(v)
    means = {t: float(sum(vs)) / len(vs) for t, vs in bk.items()}
    ts_all = list(range(min(means), max(means) + 1, 3600))
    assert sorted(got) == ts_all
    prev = None
    obs_ts = sorted(means)
    for t in ts_all:
        v, locf, lerp = got[t]
        if t in means:
            assert v == means[t] and locf == means[t] and lerp == means[t]
            prev = t
        else:
            assert v is None
            assert locf == means[prev]
            nxt = min(x for x in obs_ts if x > t)
            pv, nv = means[prev], means[nxt]
            want = pv + (nv - pv) * (t - prev) / (nxt - prev)
            assert lerp == want


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-5, 5)),                  # info.x
        st.one_of(st.none(),
                  st.lists(st.tuples(st.one_of(st.none(),
                                               st.integers(0, 3)),
                                     st.one_of(st.none(),
                                               st.lists(st.integers(0, 2),
                                                        max_size=3))),
                           max_size=4)),                           # items
    ), min_size=1, max_size=30))
def test_describe_columns_nested_matches_pure_walker(spark, rows):
    """Nested catalog vs a pure-Python walker on arbitrary ragged rows:
    per-leaf distinct/null/value counts at element multiplicity, missing
    arrays contributing nothing, depth bookkeeping."""
    from activedata_etl_spark.io import describe_columns_nested

    data = [((x,), None if items is None
             else [(k, tags) for k, tags in items])
            for x, items in rows]
    df = spark.createDataFrame(
        data, "info struct<x:int>, "
              "items array<struct<k:int,tags:array<int>>>")
    got = {r["column"]: r for r in describe_columns_nested(df).collect()}

    def stats(vals):
        nn = [v for v in vals if v is not None]
        return (len(set(nn)), len(vals) - len(nn), len(nn))

    x_vals = [x for x, _ in rows]
    k_vals = [k for _, items in rows if items for k, _ in items]
    # a NULL inner array contributes no elements (missing nested array)
    tag_vals = [t for _, items in rows if items
                for _, tags in items if tags is not None for t in tags]
    want = {"info.x": (0, *stats(x_vals)),
            "items.k": (1, *stats(k_vals)),
            "items.tags": (2, *stats(tag_vals))}
    for col, (depth, card, nulls, nvals) in want.items():
        r = got[col]
        assert (r["nested_depth"], r["cardinality"], r["n_nulls"],
                r["n_values"]) == (depth, card, nulls, nvals), col

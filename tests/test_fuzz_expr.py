"""Differential fuzzing of the jx expression compiler: random predicate
trees rendered BOTH as jx clause dicts (through plans/expressions — the
real front-end path) and as DuckDB SQL with jx's explicit semantics
(null-safe eq, both-present ne, missing-is-false and/or/not). Raw
boolean outputs are compared INCLUDING nulls — stricter than filter
equivalence, which would mask null-vs-false drift."""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from activedata_etl_spark.plans.expressions import compile_expr

COLS = ["a", "b"]
LITS = [-2, 0, 1, 3]


def _leaves():
    col = st.sampled_from(COLS)
    lit = st.sampled_from(LITS)
    return st.one_of(
        st.tuples(st.just("eq"), col, lit),
        st.tuples(st.just("ne"), col, lit),
        st.tuples(st.just("lt"), col, lit),
        st.tuples(st.just("gt"), col, lit),
        st.tuples(st.just("lte"), col, lit),
        st.tuples(st.just("gte"), col, lit),
        st.tuples(st.just("missing"), col),
        st.tuples(st.just("exists"), col),
        st.tuples(st.just("in"), col, st.lists(lit, min_size=1, max_size=3)),
    )


TREES = st.recursive(
    _leaves(),
    lambda sub: st.one_of(
        st.tuples(st.just("and"), st.lists(sub, min_size=1, max_size=3)),
        st.tuples(st.just("or"), st.lists(sub, min_size=1, max_size=3)),
        st.tuples(st.just("not"), sub),
    ),
    max_leaves=8,
)


def to_jx(t):
    op = t[0]
    if op in ("and", "or"):
        return {op: [to_jx(x) for x in t[1]]}
    if op == "not":
        return {"not": to_jx(t[1])}
    if op in ("missing", "exists"):
        return {op: t[1]}
    if op == "in":
        return {"in": [t[1], t[2]]}
    if op == "eq":
        return {"eq": {t[1]: t[2]}}
    return {op: [t[1], t[2]]}


def to_sql(t):
    op = t[0]
    if op == "and":
        return "(" + " AND ".join(f"COALESCE({to_sql(x)}, FALSE)"
                                  for x in t[1]) + ")"
    if op == "or":
        return "(" + " OR ".join(f"COALESCE({to_sql(x)}, FALSE)"
                                 for x in t[1]) + ")"
    if op == "not":
        return f"(NOT COALESCE({to_sql(t[1])}, FALSE))"
    if op == "missing":
        return f"({t[1]} IS NULL)"
    if op == "exists":
        return f"({t[1]} IS NOT NULL)"
    if op == "in":
        return f"({t[1]} IN (" + ", ".join(map(str, t[2])) + "))"
    if op == "eq":
        return f"({t[1]} IS NOT DISTINCT FROM {t[2]})"
    if op == "ne":
        return (f"({t[1]} IS NOT NULL AND {t[2]} IS NOT NULL "
                f"AND {t[1]} <> {t[2]})")
    sym = {"lt": "<", "gt": ">", "lte": "<=", "gte": ">="}[op]
    return f"({t[1]} {sym} {t[2]})"


ROWS = [(i * 6 + j, a, b)
        for i, a in enumerate([None, -2, 0, 1, 2, 3])
        for j, b in enumerate([None, -2, 0, 1, 2, 3])]


@pytest.fixture(scope="module")
def fuzz_frames(spark):
    df = spark.createDataFrame(ROWS, "id int, a int, b int")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, a INT, b INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", ROWS)
    return df, con


@settings(max_examples=25, deadline=None)
@given(st.lists(TREES, min_size=1, max_size=12))
def test_jx_expr_matches_semantic_sql(fuzz_frames, trees):
    df, con = fuzz_frames
    cols = [compile_expr(to_jx(t)).alias(f"e{i}") for i, t in enumerate(trees)]
    got = {r["id"]: tuple(r[f"e{i}"] for i in range(len(trees)))
           for r in df.select("id", *cols).collect()}
    sql = "SELECT id, " + ", ".join(
        f"{to_sql(t)} AS e{i}" for i, t in enumerate(trees)) + " FROM t"
    want = {row[0]: tuple(row[1:]) for row in con.execute(sql).fetchall()}
    assert got == want


# --- numeric kit: null-ignoring add/mult, least/greatest, coalesce, when ---

def _num_leaves():
    return st.one_of(st.sampled_from(COLS),
                     st.sampled_from(LITS).map(lambda v: ("lit", v)))


NUM_TREES = st.recursive(
    _num_leaves(),
    lambda sub: st.one_of(
        st.tuples(st.just("add"), st.lists(sub, min_size=2, max_size=3)),
        st.tuples(st.just("mult"), st.lists(sub, min_size=2, max_size=3)),
        st.tuples(st.just("min"), st.lists(sub, min_size=2, max_size=3)),
        st.tuples(st.just("max"), st.lists(sub, min_size=2, max_size=3)),
        st.tuples(st.just("coalesce"), st.lists(sub, min_size=2, max_size=3)),
        st.tuples(st.just("sub"), sub, sub),
        st.tuples(st.just("when"), _leaves(), sub, sub),
    ),
    max_leaves=6,
)


def num_to_jx(t):
    if isinstance(t, str):
        return t
    op = t[0]
    if op == "lit":
        return {"literal": t[1]}
    if op in ("add", "mult", "min", "max", "coalesce"):
        return {op: [num_to_jx(x) for x in t[1]]}
    if op == "sub":
        return {"sub": [num_to_jx(t[1]), num_to_jx(t[2])]}
    return {"when": to_jx(t[1]), "then": num_to_jx(t[2]),
            "else": num_to_jx(t[3])}


def num_to_sql(t):
    if isinstance(t, str):
        return t
    op = t[0]
    if op == "lit":
        return str(t[1])
    if op in ("add", "mult"):
        xs = [num_to_sql(x) for x in t[1]]
        unit, sym = ("0", "+") if op == "add" else ("1", "*")
        all_null = " AND ".join(f"({x}) IS NULL" for x in xs)
        folded = sym.join(f"COALESCE({x}, {unit})" for x in xs)
        return f"(CASE WHEN {all_null} THEN NULL ELSE {folded} END)"
    if op in ("min", "max"):
        fn = "least" if op == "min" else "greatest"
        return f"{fn}(" + ", ".join(num_to_sql(x) for x in t[1]) + ")"
    if op == "coalesce":
        return "COALESCE(" + ", ".join(num_to_sql(x) for x in t[1]) + ")"
    if op == "sub":
        return f"({num_to_sql(t[1])} - {num_to_sql(t[2])})"
    if op == "mod":
        # jx mod is FLOORED (Python convention): ((a % b) + b) % b
        x = num_to_sql(t[1])
        return f"((({x}) % {t[2]} + {t[2]}) % {t[2]})"
    if op == "floor":
        # jx floor-to-multiple unifies to double
        x = num_to_sql(t[1])
        return f"CAST(floor(CAST({x} AS DOUBLE) / {t[2]}) * {t[2]} AS DOUBLE)"
    return (f"(CASE WHEN COALESCE({to_sql(t[1])}, FALSE) "
            f"THEN {num_to_sql(t[2])} ELSE {num_to_sql(t[3])} END)")


@settings(max_examples=25, deadline=None)
@given(st.lists(NUM_TREES, min_size=1, max_size=12))
def test_jx_numeric_kit_matches_semantic_sql(fuzz_frames, trees):
    df, con = fuzz_frames
    cols = [compile_expr(num_to_jx(t)).cast("long").alias(f"e{i}")
            for i, t in enumerate(trees)]
    got = {r["id"]: tuple(r[f"e{i}"] for i in range(len(trees)))
           for r in df.select("id", *cols).collect()}
    sql = "SELECT id, " + ", ".join(
        f"CAST({num_to_sql(t)} AS BIGINT) AS e{i}"
        for i, t in enumerate(trees)) + " FROM t"
    want = {row[0]: tuple(row[1:]) for row in con.execute(sql).fetchall()}
    assert got == want


# --- string kit: left/right/not_left/not_right/concat/find/between ---

S_COLS = ["s", "u"]
S_LITS = ["a", "ab", "ba", "日", ""]
N_LITS = [0, 1, 2, 5]


def _str_leaves():
    return st.one_of(st.sampled_from(S_COLS),
                     st.sampled_from(S_LITS).map(lambda v: ("slit", v)))


STR_TREES = st.recursive(
    _str_leaves(),
    lambda sub: st.one_of(
        st.tuples(st.just("left"), sub, st.sampled_from(N_LITS)),
        st.tuples(st.just("right"), sub, st.sampled_from(N_LITS)),
        st.tuples(st.just("not_left"), sub, st.sampled_from(N_LITS)),
        st.tuples(st.just("not_right"), sub, st.sampled_from(N_LITS)),
        st.tuples(st.just("concat"), st.lists(sub, min_size=2, max_size=3)),
        st.tuples(st.just("between"), sub, st.sampled_from(S_LITS),
                  st.sampled_from(S_LITS)),
        st.tuples(st.just("upper"), sub),
        st.tuples(st.just("trim"), sub),
    ),
    max_leaves=5,
)


def str_to_col(t):
    from activedata_etl_spark.functions import jx
    if isinstance(t, str):
        return F.col(t)
    op = t[0]
    if op == "slit":
        return F.lit(t[1])
    if op in ("left", "right", "not_left", "not_right"):
        return getattr(jx, op)(str_to_col(t[1]), t[2])
    if op == "concat":
        return jx.concat("-", *[str_to_col(x) for x in t[1]])
    if op == "between":
        return jx.between(str_to_col(t[1]), t[2], t[3])
    if op == "upper":
        return jx.upper(str_to_col(t[1]))
    return jx.trim(str_to_col(t[1]))


def str_to_sql(t):
    if isinstance(t, str):
        return t
    op = t[0]
    if op == "slit":
        return f"'{t[1]}'"
    s = str_to_sql(t[1]) if len(t) > 1 and not isinstance(t[1], list) else None
    if op == "left":
        return f"substring({s}, 1, greatest({t[2]}, 0))"
    if op == "right":
        return (f"substring({s}, greatest(length({s}) - greatest({t[2]}, 0)"
                f" + 1, 1), greatest({t[2]}, 0))")
    if op == "not_left":
        return f"substring({s}, greatest({t[2]}, 0) + 1, length({s}))"
    if op == "not_right":
        return (f"substring({s}, 1, greatest(length({s})"
                f" - greatest({t[2]}, 0), 0))")
    if op == "concat":
        return "concat_ws('-', " + ", ".join(str_to_sql(x) for x in t[1]) + ")"
    if op == "between":
        pre, suf = t[2], t[3]
        rest = f"substring({s}, strpos({s}, '{pre}') + {len(pre)})"
        return (f"(CASE WHEN strpos({s}, '{pre}') = 0"
                f" OR strpos({rest}, '{suf}') = 0 THEN NULL"
                f" ELSE substring({rest}, 1, strpos({rest}, '{suf}') - 1) END)")
    if op == "upper":
        return f"upper({s})"
    return f"trim({s})"


@pytest.fixture(scope="module")
def str_frames(spark):
    rows = [(i, s, u) for i, (s, u) in enumerate(
        [(None, "ab"), ("", None), ("ab", "ba"), ("aabba", " a b "),
         ("xyx", "aa"), ("a", "b"), ("ab-ba", "abab"),
         ("日本語ab", "日ab"), ("ÅüÇ", "åüç"), ("a日b", "")])]
    df = spark.createDataFrame(rows, "id int, s string, u string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, s VARCHAR, u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    return df, con


@settings(max_examples=25, deadline=None)
@given(st.lists(STR_TREES, min_size=1, max_size=12))
def test_jx_string_kit_matches_semantic_sql(str_frames, trees):
    df, con = str_frames
    cols = [str_to_col(t).alias(f"e{i}") for i, t in enumerate(trees)]
    got = {r["id"]: tuple(r[f"e{i}"] for i in range(len(trees)))
           for r in df.select("id", *cols).collect()}
    sql = "SELECT id, " + ", ".join(
        f"{str_to_sql(t)} AS e{i}" for i, t in enumerate(trees)) + " FROM t"
    want = {row[0]: tuple(row[1:]) for row in con.execute(sql).fetchall()}
    assert got == want


# --- date-literal kit vs DuckDB interval arithmetic ----------------------

_NOWS = [
    "2026-01-31 13:45:10",   # month-end into short month
    "2026-03-31 00:00:00",   # month-end, midnight
    "2024-02-29 23:59:59",   # leap day
    "2026-08-14 07:00:00",   # ordinary
    "2026-12-31 12:00:00",   # year boundary
    "1969-12-31 23:59:59",   # pre-epoch (negative unix seconds)
    "1970-01-01 00:00:00",   # the epoch itself
    "2000-02-29 06:30:00",   # century leap day (div-400 rule)
]
_ANCHOR_SQL = {
    "now": "{t}",
    "today": "date_trunc('day', {t})",
    "eod": "date_trunc('day', {t}) + INTERVAL 1 DAY",
    # jx weeks start SUNDAY (mo_times floor) — DuckDB's date_trunc('week')
    # is Monday, so express the Sunday floor independently
    "week": "date_trunc('day', {t}) - to_days(CAST(dayofweek({t}) AS INT))",
    "month": "date_trunc('month', {t})",
    "year": "date_trunc('year', {t})",
}


@given(
    now_s=st.sampled_from(_NOWS),
    anchor=st.sampled_from(list(_ANCHOR_SQL)),
    sign=st.sampled_from(["+", "-"]),
    n=st.integers(min_value=0, max_value=30),
    unit=st.sampled_from(["second", "hour", "day", "week", "month", "year"]),
)
@settings(max_examples=250, deadline=None)
def test_date_literals_match_duckdb_interval_arithmetic(
        now_s, anchor, sign, n, unit):
    """jx relative date literals (functions/dates.parse_date — the
    clause every `{"gte": ["ts", "today-3month"]}` filter resolves
    through) vs DuckDB's OWN date_trunc + INTERVAL arithmetic: calendar
    months must clamp identically (Jan 31 − 1 month, leap days), week
    floors must be jx-Sunday, zero-count offsets must be no-ops."""
    import datetime as dt

    from activedata_etl_spark.functions.dates import parse_date

    expr = f"{anchor}{sign}{n}{unit}" if n else anchor
    now = dt.datetime.strptime(now_s, "%Y-%m-%d %H:%M:%S")
    py = parse_date(expr, now=now)

    base = _ANCHOR_SQL[anchor].format(t=f"TIMESTAMP '{now_s}'")
    iv = {"week": f"INTERVAL {7 * n} DAY"}.get(unit, f"INTERVAL {n} {unit.upper()}")
    core = f"({base}) {sign} {iv}" if n else base
    sql = f"SELECT CAST({core} AS TIMESTAMP)"
    duck = duckdb.sql(sql).fetchone()[0]
    assert py == duck, f"{expr} @ {now_s}: jx={py} duck={duck}"


# --- manifest-bounds extraction: plan rewrite must be result-invisible ---
#
# plans/query._range_bounds turns conjunctive range predicates into a
# file-pruning hint consumed by io.load_parquet; with a manifest present
# the SCAN changes (file subset). A wrong extraction (strict/inclusive
# mixup, extracting from under an OR/NOT, column/literal confusion)
# would silently DROP ROWS — so fuzz random predicate trees over a
# manifested layout and require run(q) ≡ plain filter, row for row.

@pytest.fixture(scope="module")
def manifested_view(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from activedata_etl_spark.io import register_parquet_table
    from activedata_etl_spark.sources import layout as L

    rows = [(i, (i * 7) % 50 if i % 11 else None,
             (i * 13) % 50 if i % 7 else None) for i in range(2000)]
    df = spark.createDataFrame(rows, "id: long, a: int, b: int")
    path = str(tmp_path_factory.mktemp("fuzzb") / "t.parquet")
    L.write_zordered(df.fillna(-1, ["a"]).withColumn("a", F.when(
        F.col("a") >= 0, F.col("a"))), path, ["id"], n_files=6, bits=11)
    L.write_manifest(spark, path, ["id", "a", "b"])
    register_parquet_table(spark, "fuzz_bounds_t", path)
    return spark.read.parquet(path)


def _bounds_leaves():
    col = st.sampled_from(["id", "a", "b"])
    lit = st.sampled_from([0, 7, 25, 49, 500, 1999])
    ops = st.sampled_from(["eq", "gt", "gte", "lt", "lte"])
    # form: dict {op:{col:lit}}, pair-literal {op:[col,{"literal":lit}]},
    # pair-column {op:[col,col2]} — ADVICE r5: pair-form with a bare
    # string comparand is a COLUMN under compile_expr; extraction must
    # skip it, never treat the name as a string bound
    form = st.sampled_from(["dict", "pair_lit", "pair_col"])
    return st.tuples(ops, col, lit, form, col)


BOUND_TREES = st.recursive(
    _bounds_leaves(),
    lambda sub: st.one_of(
        st.tuples(st.just("and"), st.lists(sub, min_size=1, max_size=3)),
        st.tuples(st.just("or"), st.lists(sub, min_size=1, max_size=3)),
        st.tuples(st.just("not"), sub),
    ),
    max_leaves=6,
)


def _to_jx_bounds(t):
    op = t[0]
    if op in ("and", "or"):
        return {op: [_to_jx_bounds(x) for x in t[1]]}
    if op == "not":
        return {"not": _to_jx_bounds(t[1])}
    _, col, lit, form, col2 = t
    if form == "pair_lit":
        return {op: [col, {"literal": lit}]}
    if form == "pair_col":
        return {op: [col, col2]}
    return {op: {col: lit}}


def test_range_bounds_pair_form_column_comparand():
    """ADVICE r5 (high): {"lt": ["ts", "other_ts"]} compares two COLUMNS
    — extracting 'other_ts' as a string bound pruned files against the
    column NAME, silently dropping rows. Pair-form only contributes a
    bound for {"literal": ...} / non-string scalars; dict form keeps its
    value-is-constant semantics."""
    from activedata_etl_spark.plans.query import _range_bounds

    assert _range_bounds({"lt": ["ts", "other_ts"]}) == {}
    assert _range_bounds({"and": [{"gte": {"ts": 5}},
                                  {"lt": ["ts", "other_ts"]}]}) \
        == {"ts": (5, None)}
    assert _range_bounds({"lt": ["ts", {"literal": "2020"}]}) \
        == {"ts": (None, "2020")}
    assert _range_bounds({"lt": ["ts", 7]}) == {"ts": (None, 7)}
    # dict form: a bare string value IS a literal constant
    assert _range_bounds({"lt": {"ts": "2020"}}) == {"ts": (None, "2020")}


@settings(max_examples=20, deadline=None)
@given(BOUND_TREES)
def test_manifest_bounds_extraction_result_invisible(spark, manifested_view,
                                                     tree):
    from activedata_etl_spark.plans.query import run

    w = _to_jx_bounds(tree)
    got = sorted(r["id"] for r in run(
        spark, {"from": "fuzz_bounds_t", "where": w,
                "select": ["id"]}).collect())
    want = sorted(r["id"] for r in
                  manifested_view.filter(compile_expr(w))
                  .select("id").collect())
    assert got == want, w

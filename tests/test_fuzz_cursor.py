"""Property test for keyset-cursor semantics (plans/cursor.py): for ANY
dataset with NULLs and ties and ANY mixed-direction sort spec ending in
a unique tiebreak, walking pages via cursor_predicate/advance must tile
the directly-sorted result exactly — no skips, no repeats. This pins
the subtle parts (asc-nulls-first vs desc-nulls-last boundaries,
null-safe tie chaining) far beyond the handful of service tests."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from activedata_etl_spark.plans.cursor import advance, cursor_predicate
from activedata_etl_spark.plans.expressions import compile_expr

rows_st = st.lists(
    st.tuples(st.one_of(st.none(), st.integers(-3, 3)),
              st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))),
    min_size=0, max_size=14)
dirs_st = st.tuples(st.sampled_from([1, -1]), st.sampled_from([1, -1]))


@pytest.fixture(scope="module")
def cursor_df_cache(spark):
    return {}


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_st, dirs=dirs_st, page=st.integers(1, 4))
def test_cursor_pages_tile_any_ordering(spark, cursor_df_cache,
                                        rows, dirs, page):
    key = tuple(rows)
    if key in cursor_df_cache:
        df = cursor_df_cache[key]
    else:
        data = [(x, y, i) for i, (x, y) in enumerate(rows)]
        df = spark.createDataFrame(data, "x int, y string, id int") \
            if data else spark.createDataFrame([], "x int, y string, id int")
        df = df.cache()
        df.count()
        cursor_df_cache[key] = df
    sorts = [("x", dirs[0]), ("y", dirs[1]), ("id", 1)]  # id = unique tiebreak

    def sort_cols():
        from pyspark.sql import functions as F
        out = []
        for c, d in sorts:
            col = F.col(c)
            out.append(col.asc_nulls_first() if d == 1
                       else col.desc_nulls_last())
        return out

    expected = [r["id"] for r in df.orderBy(*sort_cols()).collect()]
    seen, after, guard = [], None, 0
    while guard <= len(rows) + 2:
        guard += 1
        page_df = df
        if after is not None:
            page_df = page_df.filter(
                compile_expr(cursor_predicate(sorts, after)))
        batch = page_df.orderBy(*sort_cols()).limit(page).collect()
        seen += [r["id"] for r in batch]
        if len(batch) < page:
            break
        after = advance(sorts, batch[-1].asDict())
    assert seen == expected

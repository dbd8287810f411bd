"""Differential fuzzing of the BM25 integer rearrangement: random
corpora and term sets scored by ext/text.bm25_topk (Spark) AND by the
templated DuckDB rational — scores must match EXACTLY (the oracle-gate
comparator's own standard). This is the sixth differential fuzzer;
unlike the python-reference property test it exercises the actual
cross-ENGINE boundary (DuckDB casts, floor, HUGEINT-avoidance) over
corpus shapes the fixture never produces (tiny docs, df=N terms,
single-doc corpora, repeated tokens)."""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from activedata_etl_spark.ext.text import bm25_topk

VOCAB = ["aa", "bb", "cc", "dd", "ee"]

CORPUS = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=10),
    min_size=1, max_size=8)

TERMS = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3,
                 unique=True)

_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM t
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS total FROM dl
), tf AS (
  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
  WHERE w IN ({terms}) GROUP BY doc_id, w
), dfreq AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
), scored AS (
  SELECT tf.doc_id,
         CAST(2200 * tf.tf * (2 * n.n_docs - 2 * dfreq.df + 1) AS DOUBLE)
           * CAST(n.total AS DOUBLE)
         / (CAST(2 * dfreq.df + 1 AS DOUBLE)
            * CAST(1000 * tf.tf * n.total + 300 * n.total
                   + 900 * dl.dl * n.n_docs AS DOUBLE)) AS s
  FROM tf JOIN dfreq USING (w) JOIN dl USING (doc_id) CROSS JOIN n
)
SELECT doc_id,
       CAST(CAST(SUM(CAST(floor(s * 1000000.0) AS BIGINT)) AS BIGINT)
            AS DOUBLE) / 1000000.0 AS bm25
FROM scored GROUP BY doc_id
"""


@settings(max_examples=20, deadline=None)
@given(CORPUS, TERMS)
def test_bm25_matches_duckdb_on_random_corpora(spark, corpus, terms):
    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_topk(df, "doc_id", "text", terms,
                              k=len(docs)).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", docs)
    sql = _SQL.format(terms=", ".join(f"'{w}'" for w in terms))
    want = dict(con.execute(sql).fetchall())
    # bm25_topk returns all docs with >=1 term hit (k = corpus size)
    assert got == {k: v for k, v in want.items() if k in got}
    assert set(want) == set(got)

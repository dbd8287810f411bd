"""Streaming maintenance of the BM25 retrieval index: postings are
per-document FACTS (not counters), so batch-keyed overwrite makes
at-least-once replay rewrite identical bytes; corpus stats (df, N,
total) are derived merge-on-read, so appended batches are searchable —
and retract cleanly if a batch directory is deleted."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.ext import text as TX
from activedata_etl_spark.streaming import stream as ST


def _topk(spark, path):
    return [(r["doc_id"], r["bm25"]) for r in TX.bm25_query_index(
        spark, path, ["spark", "vector", "merge"], k=10).collect()]


def test_stream_bm25_appends_and_replay_idempotence(spark, sf_dir, tmp_path):
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    inbox = str(tmp_path / "inbox")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(inbox)
    idx = str(tmp_path / "idx")

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        TX.append_bm25_index(batch_df, "doc_id", "text", idx, batch_id)

    ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                         ingest, str(tmp_path / "ckpt")).awaitTermination(120)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(inbox)
    ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                         ingest, str(tmp_path / "ckpt")).awaitTermination(120)

    # index-served == direct corpus scoring, to the last bit
    want = [(r["doc_id"], r["bm25"]) for r in TX.bm25_topk(
        docs, "doc_id", "text", ["spark", "vector", "merge"], k=10).collect()]
    assert _topk(spark, idx) == want

    # at-least-once replay of batch 0: identical bytes, unchanged result
    TX.append_bm25_index(docs.filter(F.col("doc_id") % 2 == 0),
                         "doc_id", "text", idx, 0)
    assert _topk(spark, idx) == want

    # retracting a batch removes its docs from EVERY statistic
    # (postings AND the _dl facts shard drop together)
    TX.retract_bm25_batch(idx, 1)
    want_half = [(r["doc_id"], r["bm25"]) for r in TX.bm25_topk(
        docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text",
        ["spark", "vector", "merge"], k=10).collect()]
    assert _topk(spark, idx) == want_half


def test_bm25_index_compaction_invisible(spark, sf_dir, tmp_path):
    """Compacting N batch shards into one must not change any served
    result (postings are facts; stats derive on read either way), and
    a disjoint append AFTER compaction serves correctly — the real
    lifecycle: append... compact, append more."""
    import os

    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    idx = str(tmp_path / "idx")
    for b in range(3):
        TX.append_bm25_index(docs.filter(F.col("doc_id") % 4 == b),
                             "doc_id", "text", idx, b)
    before = _topk(spark, idx)
    n = TX.compact_bm25_index(spark, idx)
    assert n == 3
    assert sorted(os.listdir(idx)) == ["_dl", "batch=0"]
    assert _topk(spark, idx) == before
    # disjoint append after compaction: index == direct corpus scoring
    TX.append_bm25_index(docs.filter(F.col("doc_id") % 4 == 3),
                         "doc_id", "text", idx, 1)
    want = [(r["doc_id"], r["bm25"]) for r in TX.bm25_topk(
        docs, "doc_id", "text", ["spark", "vector", "merge"],
        k=10).collect()]
    assert _topk(spark, idx) == want


def test_purge_ids_removes_from_every_statistic(spark, sf_dir, tmp_path):
    """GDPR purge: after purge_from_fact_index, the served BM25 result
    equals a fresh index built WITHOUT the purged docs — df/N/total all
    reflect the removal (facts + merge-on-read, no tombstones); only
    shards containing purged ids were rewritten."""
    import os

    from activedata_etl_spark.ext.text import purge_from_fact_index

    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    idx = str(tmp_path / "idx")
    for b in range(3):
        TX.append_bm25_index(docs.filter(F.col("doc_id") % 3 == b),
                             "doc_id", "text", idx, b)
    purged = [0, 3, 7, 9]
    n = purge_from_fact_index(spark, idx, purged, id_col="id")
    assert n >= 1
    remaining = docs.filter(~F.col("doc_id").isin(purged))
    want = [(r["doc_id"], r["bm25"]) for r in TX.bm25_topk(
        remaining, "doc_id", "text", ["spark", "vector", "merge"],
        k=10).collect()]
    assert _topk(spark, idx) == want
    # shard 1 (ids ≡ 1 mod 3) contained no purged id → untouched, in
    # both the postings root and the _dl facts sidecar (2 + 2 rewrites)
    assert n == 4

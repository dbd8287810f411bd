"""Streaming maintenance of the persisted near-dup index: a file-queue
stream of document batches feeds foreachBatch, each micro-batch appends
its signatures/shingle-sets (ext/dedup_index.append_to_index), and the
index ends bit-identical to a from-scratch build — the incremental-ETL
idempotence story (reference: SQS-driven at-least-once workers) composed
with the LSH dedup index."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.ext import dedup_index as DI
from activedata_etl_spark.streaming import stream as ST

PARAMS = dict(n_hashes=16, n_bands=4, shingle_n=3)
THRESHOLD = 0.2


def test_stream_appends_build_equivalent_index(spark, sf_dir, tmp_path):
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .filter(F.col("doc_id") < 200).select("doc_id", "text"))

    # the work queue: two arrival batches, written as separate files
    inbox = str(tmp_path / "inbox")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(inbox)
    idx = str(tmp_path / "idx")

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        DI.append_to_index(batch_df, "doc_id", "text", idx, **PARAMS)

    src = ST.file_stream(spark, inbox, docs.schema)
    q = ST.run_foreach_batch(src, ingest, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # second arrival sweep: new files land in the SAME inbox; the
    # checkpoint makes the stream pick up only the delta.
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(inbox)
    q2 = ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                              ingest, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)

    full = str(tmp_path / "full")
    DI.build_index(docs, "doc_id", "text", full, **PARAMS)

    pairs = lambda p: {(r.id_a, r.id_b, round(r.jaccard, 9))  # noqa: E731
                       for r in DI.near_dup_pairs_from_index(spark, p, THRESHOLD).collect()}
    assert pairs(idx) == pairs(full)
    assert DI.read_signatures(spark, idx).count() == \
        DI.read_signatures(spark, full).count()


def test_ahash_index_replay_idempotent_and_matches_full(spark, sf_dir, tmp_path):
    """The perceptual-hash index follows the standing index contract:
    (a) pairs_against_index(delta) equals the full ahash_pairs run
    restricted to delta-touching pairs; (b) replaying an append changes
    nothing (at-least-once safety via dropDuplicates-on-read)."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import multimodal as MM
    from activedata_etl_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    hist = d.filter(F.col("doc_id") % 10 < 7)
    delta = d.filter(F.col("doc_id") % 10 >= 7)
    path = str(tmp_path / "ahash_idx")
    MM.build_ahash_index(hist, "doc_id", "text", path)

    got = sorted(map(tuple, MM.ahash_pairs_against_index(
        delta, "doc_id", "text", spark, path).collect()))
    full = MM.ahash_pairs(d, "doc_id", "text", max_hamming=6)
    want = sorted(map(tuple, full.filter(
        (F.col("id_a") % 10 >= 7) | (F.col("id_b") % 10 >= 7)).collect()))
    assert got == want and len(got) > 0

    # replay: appending the SAME historical batch twice is a no-op
    MM.append_ahash_index(hist, "doc_id", "text", path)
    again = sorted(map(tuple, MM.ahash_pairs_against_index(
        delta, "doc_id", "text", spark, path).collect()))
    assert again == got


def test_stream_maintained_ahash_index(spark, sf_dir, tmp_path):
    """Streaming maintenance of the aHash index: file-queue micro-batches
    append bands via foreachBatch; after two arrival sweeps the index
    serves the same delta pairs as a from-scratch build."""
    from activedata_etl_spark.ext import multimodal as MM

    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .filter(F.col("doc_id") < 200).select("doc_id", "text"))
    hist = docs.filter(F.col("doc_id") % 10 < 7)
    delta = docs.filter(F.col("doc_id") % 10 >= 7)

    inbox = str(tmp_path / "inbox")
    hist.filter(F.col("doc_id") % 2 == 0).write.parquet(inbox)
    idx = str(tmp_path / "ahash_idx")

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        MM.append_ahash_index(batch_df, "doc_id", "text", idx)

    q = ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                             ingest, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    hist.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(inbox)
    q2 = ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                              ingest, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)

    full = str(tmp_path / "full")
    MM.build_ahash_index(hist, "doc_id", "text", full)
    pairs = lambda p: sorted(map(tuple, MM.ahash_pairs_against_index(  # noqa: E731
        delta, "doc_id", "text", spark, p).collect()))
    assert pairs(idx) == pairs(full) != []

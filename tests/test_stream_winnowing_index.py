"""Streaming maintenance of the winnowing fingerprint index:
fingerprints are per-document facts (batch-keyed overwrite = replay
safety); index-served pairs must equal the direct operator over the
same corpus, and the delta query must equal the full pairs restricted
to delta-touching pairs."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.ext import dedup as DD
from activedata_etl_spark.streaming import stream as ST


def test_winnowing_index_append_replay_delta(spark, sf_dir, tmp_path):
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    inbox = str(tmp_path / "inbox")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(inbox)
    idx = str(tmp_path / "idx")

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        DD.append_winnowing_index(batch_df, "doc_id", "text", idx, batch_id)

    ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                         ingest, str(tmp_path / "ckpt")).awaitTermination(120)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(inbox)
    ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                         ingest, str(tmp_path / "ckpt")).awaitTermination(120)

    def pairs(df):
        return sorted(map(tuple, df.collect()))

    want = pairs(DD.winnowing_pairs(docs, "doc_id", "text"))
    assert pairs(DD.winnowing_pairs_from_index(spark, idx)) == want

    # at-least-once replay: identical bytes, unchanged result
    DD.append_winnowing_index(docs.filter(F.col("doc_id") % 2 == 0),
                              "doc_id", "text", idx, 0)
    assert pairs(DD.winnowing_pairs_from_index(spark, idx)) == want

    # delta query: evens stored, odds as the delta — only delta-touching
    # pairs, equal to the full result restricted to pairs with an odd id
    import shutil

    half_idx = str(tmp_path / "idx_half")
    DD.append_winnowing_index(docs.filter(F.col("doc_id") % 2 == 0),
                              "doc_id", "text", half_idx, 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    got = pairs(DD.winnowing_delta_pairs(spark, half_idx, delta,
                                         "doc_id", "text"))
    want_delta = [p for p in want if p[0] % 2 == 1 or p[1] % 2 == 1]
    assert got == sorted(want_delta)

"""Streaming maintenance of the prefix-filter ELEMENT index: batches
append (id, element) rows; the delta-restricted exact prefix join over
the streamed index equals the from-scratch answer computed with no index
at all; at-least-once replay changes nothing (dropDuplicates at read)."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.ext import dedup as DD
from activedata_etl_spark.streaming import stream as ST


def test_stream_element_index_delta_equals_scratch(spark, sf_dir, tmp_path):
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    stored = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    inbox, idx = str(tmp_path / "inbox"), str(tmp_path / "idx")
    stored.filter(F.col("doc_id") % 2 == 0).write.parquet(inbox)

    seen = []

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        DD.append_element_index(batch_df, "doc_id", "text", idx,
                                batch=len(seen))
        seen.append(batch_id)

    q = ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                             ingest, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    stored.filter(F.col("doc_id") % 2 == 1).write.mode("append") \
        .parquet(inbox)
    q2 = ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                              ingest, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)

    def pairs():
        return sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in
            DD.prefix_join_index_delta(spark, idx, delta, "doc_id",
                                       "text", threshold=0.5).collect())

    # from-scratch truth: exact pairs over the WHOLE corpus, restricted
    # to pairs touching a delta id (the delta join's contract)
    full = DD.prefix_filter_pairs(docs, "doc_id", "text", threshold=0.5)
    scratch = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in full.collect()
        if r["id_a"] % 3 == 0 or r["id_b"] % 3 == 0)
    streamed = pairs()
    assert streamed == scratch and len(scratch) > 0

    # at-least-once replay: duplicate element rows are absorbed by the
    # dropDuplicates at read
    DD.append_element_index(stored.filter(F.col("doc_id") % 2 == 0),
                            "doc_id", "text", idx, batch=99)
    assert pairs() == scratch

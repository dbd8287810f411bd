"""Streaming maintenance of the chunk-level boilerplate index: batches
append (chunk-hash, doc) pairs; the duplicated-chunk set is computed at
read and equals the single-pass answer; replay changes nothing."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.ext import dedup as DD
from activedata_etl_spark.streaming import stream as ST


def test_stream_chunk_index_equals_single_pass(spark, sf_dir, tmp_path):
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    inbox, idx = str(tmp_path / "inbox"), str(tmp_path / "idx")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(inbox)

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        DD.append_chunk_index(batch_df, "doc_id", "text", idx)

    q = ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                             ingest, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(inbox)
    q2 = ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                              ingest, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)

    dup = lambda: sorted(map(tuple, DD.duplicated_chunks_from_index(  # noqa: E731
        spark, idx).collect()))
    single = sorted(
        (r["h"], r["n_docs"]) for r in
        DD.chunk_table(docs, "doc_id", "text", 10)
          .groupBy("h").agg(F.countDistinct("doc_id").alias("n_docs"))
          .filter(F.col("n_docs") >= 2).collect())
    streamed = dup()
    assert streamed == single and len(single) > 0

    # at-least-once replay: duplicate append is absorbed by the distinct
    DD.append_chunk_index(docs.filter(F.col("doc_id") % 2 == 0),
                          "doc_id", "text", idx)
    assert dup() == single

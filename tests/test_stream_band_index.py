"""Streaming maintenance of the persisted quantized embedding index:
micro-batches of new vectors append their own index rows
(ext/similarity.append_to_band_index — scan-local, pure function of the
vector), and the index answers pairs identically to a from-scratch
build. Replayed appends are harmless: rows are bit-identical and the
read path dedupes on id."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.ext import similarity as SIM
from activedata_etl_spark.streaming import stream as ST

THRESHOLD = 0.95


def _pairs(spark, path):
    return {(r.id_a, r.id_b, r.qcos)
            for r in SIM.pairs_from_band_index(spark, path, THRESHOLD).collect()}


def test_stream_appends_build_equivalent_band_index(spark, sf_dir, tmp_path):
    emb = (spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
           .select("vec_id", "embedding"))
    # duplicated corpus: every original pairs with its copy at qcos 1
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding"))

    inbox = str(tmp_path / "inbox")
    corpus.filter(F.col("vec_id") % 2 == 0).write.parquet(inbox)
    idx = str(tmp_path / "idx")

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        SIM.append_to_band_index(batch_df, "vec_id", "embedding", idx)

    src = ST.file_stream(spark, inbox, corpus.schema)
    ST.run_foreach_batch(src, ingest, str(tmp_path / "ckpt")).awaitTermination(120)

    # second arrival sweep picks up only the delta via the checkpoint
    corpus.filter(F.col("vec_id") % 2 == 1).write.mode("append").parquet(inbox)
    ST.run_foreach_batch(ST.file_stream(spark, inbox, corpus.schema),
                         ingest, str(tmp_path / "ckpt")).awaitTermination(120)

    full = str(tmp_path / "full")
    SIM.build_band_index(corpus, "vec_id", "embedding", full)
    assert _pairs(spark, idx) == _pairs(spark, full)
    assert SIM.read_band_index(spark, idx).count() == corpus.count()

    # at-least-once replay: append one batch AGAIN; the id-dedupe on read
    # keeps the answer identical
    SIM.append_to_band_index(corpus.filter(F.col("vec_id") % 2 == 0),
                             "vec_id", "embedding", idx)
    assert _pairs(spark, idx) == _pairs(spark, full)

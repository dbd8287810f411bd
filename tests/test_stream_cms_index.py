"""Streaming maintenance of the count-min frequency index: counters are
SUMS, so at-least-once replay would double-count — the index therefore
appends via batch-keyed OVERWRITE (functions/cms.append_cms_index), and
a deliberately replayed batch leaves the merged sketch identical to a
from-scratch build."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.functions import cms
from activedata_etl_spark.streaming import stream as ST


def _sketch(spark, path):
    return {(r["event_type"], r["row"], r["col"], r["n"])
            for r in cms.read_cms_index(spark, path, ["event_type"]).collect()}


def test_stream_cms_appends_and_replay_idempotence(spark, sf_dir, tmp_path):
    events = (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
              .select("event_id", "event_type", "user_id"))
    inbox = str(tmp_path / "inbox")
    events.filter(F.col("event_id") % 2 == 0).write.parquet(inbox)
    idx = str(tmp_path / "idx")

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        cms.append_cms_index(batch_df, ["event_type"], "user_id", idx, batch_id)

    ST.run_foreach_batch(ST.file_stream(spark, inbox, events.schema),
                         ingest, str(tmp_path / "ckpt")).awaitTermination(120)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(inbox)
    ST.run_foreach_batch(ST.file_stream(spark, inbox, events.schema),
                         ingest, str(tmp_path / "ckpt")).awaitTermination(120)

    full = cms.cms_registers(events, ["event_type"], "user_id")
    want = {(r["event_type"], r["row"], r["col"], r["n"])
            for r in full.collect()}
    assert _sketch(spark, idx) == want

    # simulate an at-least-once REPLAY of batch 0: the batch-keyed
    # overwrite rewrites identical bytes — the merged sketch is unchanged
    cms.append_cms_index(events.filter(F.col("event_id") % 2 == 0),
                         ["event_type"], "user_id", idx, 0)
    assert _sketch(spark, idx) == want

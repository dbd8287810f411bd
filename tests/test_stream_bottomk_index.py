"""Streaming maintenance of the bottom-k (KMV) signature index:
micro-batches append signatures, merge-on-read re-takes the top-k after
a DISTINCT, and at-least-once replay is a no-op — the idempotence comes
from distinct+top-k itself (the HLL max() argument), not a transaction.
Also pins the closure property merge(sig(A), sig(B)) == sig(A ∪ B).
"""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.functions import bottomk as BK
from activedata_etl_spark.streaming import stream as ST

K = 16


def test_bottomk_merge_closure(spark, sf_dir):
    e = (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
         .select("event_type", "user_id"))
    a = e.filter(F.col("user_id") % 2 == 0)
    b = e.filter(F.col("user_id") % 2 == 1)
    merged = sorted(map(tuple, BK.bottomk_merge(
        BK.bottomk_signature(a, ["event_type"], "user_id", K),
        BK.bottomk_signature(b, ["event_type"], "user_id", K),
        group_cols=["event_type"], k=K).collect()))
    direct = sorted(map(tuple, BK.bottomk_signature(
        e, ["event_type"], "user_id", K).collect()))
    assert merged == direct and len(direct) > 0


def test_stream_bottomk_signature_maintenance(spark, sf_dir, tmp_path):
    events = (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
              .select("event_id", "event_type", "user_id"))

    inbox = str(tmp_path / "inbox")
    idx = str(tmp_path / "idx")
    events.filter(F.col("event_id") % 2 == 0).write.parquet(inbox)

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        BK.append_signature(batch_df, ["event_type"], "user_id", idx, k=K)

    q = ST.run_foreach_batch(ST.file_stream(spark, inbox, events.schema),
                             ingest, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    events.filter(F.col("event_id") % 2 == 1) \
        .write.mode("append").parquet(inbox)
    q2 = ST.run_foreach_batch(ST.file_stream(spark, inbox, events.schema),
                              ingest, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)

    streamed = sorted(map(tuple, BK.read_signature(
        spark, idx, ["event_type"], k=K).collect()))
    single = sorted(map(tuple, BK.bottomk_signature(
        events, ["event_type"], "user_id", K).collect()))
    assert streamed == single

    # at-least-once: replay one batch verbatim -> index unchanged
    BK.append_signature(events.filter(F.col("event_id") % 2 == 0),
                        ["event_type"], "user_id", idx, k=K)
    replayed = sorted(map(tuple, BK.read_signature(
        spark, idx, ["event_type"], k=K).collect()))
    assert replayed == single

"""Streaming maintenance of the portable-HLL NDV index: micro-batches
append registers, merge happens at read, and at-least-once replay is a
no-op — the idempotence comes from max() itself, not a transaction."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.functions import hll
from activedata_etl_spark.streaming import stream as ST


def test_stream_hll_register_maintenance(spark, sf_dir, tmp_path):
    orders = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
              .select("o_orderkey", "o_orderstatus"))

    inbox = str(tmp_path / "inbox")
    idx = str(tmp_path / "idx")
    orders.filter(F.col("o_orderkey") % 2 == 0).write.parquet(inbox)

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        hll.append_registers(batch_df, ["o_orderstatus"], "o_orderkey", idx)

    q = ST.run_foreach_batch(ST.file_stream(spark, inbox, orders.schema),
                             ingest, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    orders.filter(F.col("o_orderkey") % 2 == 1) \
        .write.mode("append").parquet(inbox)
    q2 = ST.run_foreach_batch(ST.file_stream(spark, inbox, orders.schema),
                              ingest, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)

    streamed = sorted(map(tuple, hll.read_registers(
        spark, idx, ["o_orderstatus"]).collect()))
    single = sorted(map(tuple, hll.hll_registers(
        orders, ["o_orderstatus"], "o_orderkey").collect()))
    assert streamed == single

    # at-least-once: replay one batch verbatim -> index unchanged
    hll.append_registers(orders.filter(F.col("o_orderkey") % 2 == 0),
                         ["o_orderstatus"], "o_orderkey", idx)
    replayed = sorted(map(tuple, hll.read_registers(
        spark, idx, ["o_orderstatus"]).collect()))
    assert replayed == single

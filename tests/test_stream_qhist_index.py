"""Streaming maintenance of the log-histogram quantile index: counts
are SUMS, so each micro-batch overwrites its own batch-keyed directory
(the CMS idempotence pattern) and merge-on-read sums the shards —
replaying a batch rewrites identical bytes instead of double-counting.
"""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.functions import qhist as QH
from activedata_etl_spark.streaming import stream as ST


def test_stream_qhist_register_maintenance(spark, sf_dir, tmp_path):
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "lang", "n_chars"))

    inbox = str(tmp_path / "inbox")
    idx = str(tmp_path / "idx")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(inbox)

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        QH.append_qhist_index(batch_df, ["lang"], "n_chars", idx,
                              batch_id=batch_id)

    q = ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                             ingest, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    docs.filter(F.col("doc_id") % 2 == 1) \
        .write.mode("append").parquet(inbox)
    q2 = ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                              ingest, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)

    streamed = sorted(map(tuple, QH.read_qhist_index(
        spark, idx, ["lang"]).collect()))
    single = sorted(map(tuple, QH.qhist_registers(
        docs, ["lang"], "n_chars").collect()))
    assert streamed == single and len(single) > 0

    # at-least-once: re-running a batch overwrites its own dir — no-op
    batches = sorted(d for d in os.listdir(idx) if d.startswith("batch="))
    first = int(batches[0].split("=")[1])
    QH.append_qhist_index(docs.filter(F.col("doc_id") % 2 == 0),
                          ["lang"], "n_chars", idx, batch_id=first)
    replayed = sorted(map(tuple, QH.read_qhist_index(
        spark, idx, ["lang"]).collect()))
    assert replayed == single

    # quantile bounds from the streamed index: the exact order statistic
    # must fall inside every [lo, hi] envelope (the factor-2 guarantee)
    bounds = QH.qhist_quantile_bounds(
        QH.read_qhist_index(spark, idx, ["lang"]),
        ["lang"], {"p50": (1, 2)}).collect()
    exact = {r["lang"]: r["med"] for r in docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med")).collect()}
    for r in bounds:
        assert r["p50_lo"] <= exact[r["lang"]] * 1.0 <= r["p50_hi"] + 1, r

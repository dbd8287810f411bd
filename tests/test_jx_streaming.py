"""The jx JSON front-end over a STREAMING source — the reference's
continuous-query role: the same query dict plans against a batch view
or a readStream view with zero planner changes (Structured Streaming's
unified DataFrame surface means `plans/query.py` never learns which it
got), and the streamed answer equals the batch answer once the stream
drains. This extends the r3 source-swap invariance proof from raw
DataFrame pipelines to the jx front-end itself."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.plans import query as JXQ
from activedata_etl_spark.streaming import stream as ST

_Q = {
    "from": "events_src",
    "where": {"gte": ["user_id", 10]},
    "groupby": "event_type",
    "select": [
        {"name": "n", "aggregate": "count"},
        # (exact cardinality is a distinct agg — unsupported on streams;
        # the approx path exists separately)
        {"name": "maxu", "value": "user_id", "aggregate": "max"},
    ],
}


def test_jx_query_over_stream_equals_batch(spark, sf_dir, tmp_path):
    events = (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
              .select("event_id", "user_id", "event_type"))
    inbox = str(tmp_path / "inbox")
    # two arrival files so the stream sees >1 batch's worth of data
    events.filter(F.col("event_id") % 2 == 0).write.parquet(inbox)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(inbox)

    # batch truth through the SAME front-end
    events.createOrReplaceTempView("events_src")
    batch = {(r["event_type"], r["n"], r["maxu"])
             for r in JXQ.run(spark, _Q).collect()}

    # swap the view for a readStream source; the planner is untouched
    ST.file_stream(spark, inbox, events.schema) \
        .createOrReplaceTempView("events_src")
    sdf = JXQ.run(spark, _Q)
    assert sdf.isStreaming
    q = (sdf.writeStream.format("memory").queryName("jx_stream_out")
         .outputMode("complete")
         .trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.awaitTermination(120)
    streamed = {(r["event_type"], r["n"], r["maxu"])
                for r in spark.sql("SELECT * FROM jx_stream_out").collect()}
    assert streamed == batch and len(batch) > 0

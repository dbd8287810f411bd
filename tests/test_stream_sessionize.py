"""Streaming session windows: the SAME sessionize() operator run as a
watermarked stream over file-source sweeps must emit, in append mode,
exactly the batch sessions once the watermark passes them — sessions
that straddle the sweep boundary extend through checkpointed state
rather than restarting."""

import datetime as dt

from pyspark.sql import functions as F

from activedata_etl_spark.io import load_table
from activedata_etl_spark.streaming.batch_windows import sessionize
from activedata_etl_spark.streaming.stream import file_stream


def test_streaming_sessionize_matches_batch(spark, sf_dir, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("in", "ck", "out"))
    events = load_table(spark, sf_dir, "events").select("user_id", "ts")

    # split by time so sweep 2 only ever EXTENDS sweep-1 sessions
    mid = events.agg(F.expr("percentile(unix_micros(ts), 0.5)")).first()[0]
    cut = F.timestamp_micros(F.lit(int(mid)))
    first, second = events.filter(F.col("ts") < cut), events.filter(F.col("ts") >= cut)

    # append mode emits a session only once the watermark passes its end:
    # sentinel events (user -1) far past the real data force the global
    # watermark beyond every real session; their own session stays open
    # and is excluded from the comparison
    far = [(int(-1), dt.datetime(2030, 1, 1) + dt.timedelta(days=i)) for i in range(2)]
    sentinels = [spark.createDataFrame([f], events.schema) for f in far]

    def sweep(df):
        df.write.mode("append").parquet(src)
        stream = file_stream(spark, src, events.schema).withWatermark("ts", "2 hours")
        q = (
            sessionize(stream, "ts", "30 minutes", ["user_id"],
                       {"n_events": F.count(F.lit(1))})
            .writeStream.foreachBatch(
                lambda bdf, _bid: bdf.write.mode("append").parquet(out))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    sweep(first)
    sweep(second.unionByName(sentinels[0]))
    sweep(sentinels[1])  # one more batch so watermark-closed sessions flush

    final = (spark.read.parquet(out)
             .filter(F.col("user_id") >= 0)
             .select("user_id", "session_start", "session_end", "n_events"))
    truth = sessionize(events, "ts", "30 minutes", ["user_id"],
                       {"n_events": F.count(F.lit(1))}) \
        .select("user_id", "session_start", "session_end", "n_events")
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, truth.collect()))

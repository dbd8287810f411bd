"""Streaming row-level dedup: dropDuplicatesWithinWatermark across
micro-batches — the streaming form of the reference's at-least-once +
`_id`-overwrite idempotence."""

from pyspark.sql import functions as F

from activedata_etl_spark.io import load_table
from activedata_etl_spark.streaming.stream import file_stream


def test_drop_duplicates_within_watermark(spark, sf_dir, tmp_path):
    src, ckpt, out = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    # an at-least-once source: every event delivered twice
    events.write.mode("append").parquet(src)
    events.write.mode("append").parquet(src)

    stream = file_stream(spark, src, events.schema)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (deduped.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == events.count()  # duplicates collapsed
    assert got.select("event_id").distinct().count() == events.count()

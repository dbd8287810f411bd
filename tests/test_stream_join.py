"""Watermark-bounded stream-stream join: click→purchase attribution over
two file streams, checked against the equivalent batch join (same data,
same predicate) — streaming must add no rows and lose none once the
backlog is drained."""

from pyspark.sql import functions as F

from activedata_etl_spark.io import load_table
from activedata_etl_spark.streaming.stream import file_stream, stream_stream_join


def _split_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id",
                                                    "event_type", "value")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"), "user_id"))
    buys = (ev.filter(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("buy_id"),
                    F.col("ts").alias("buy_ts"), "user_id",
                    F.col("value").alias("amount")))
    return clicks, buys


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    clicks, buys = _split_events(spark, sf_dir)
    cdir, bdir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    clicks.write.parquet(cdir)
    buys.write.parquet(bdir)

    # equality key must reference both sides unambiguously → rename one
    sl = file_stream(spark, cdir, clicks.schema)
    sr = file_stream(spark, bdir, buys.schema).withColumnRenamed(
        "user_id", "r_user_id")
    sj = stream_stream_join(
        sl, sr, "click_ts", "buy_ts",
        on=F.col("user_id") == F.col("r_user_id"),
        watermark="2 hours", max_lag="30 minutes",
    ).select("click_id", "buy_id", "user_id", "amount")

    q = (sj.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.read.parquet(out)

    batch = (clicks.join(
        buys.withColumnRenamed("user_id", "r_user_id"),
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 minutes")))
        .select("click_id", "buy_id", "user_id", "amount"))

    assert got.count() == batch.count() > 0
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stream_stream_left_outer_watermark_delayed(spark, sf_dir, tmp_path):
    """Left-outer stream-stream join: unmatched left rows are emitted only
    once the watermark passes their join window — delayed, not dropped.
    Sweep 1 drains the data (inner matches emit); appending a
    far-future sentinel and sweeping again advances the watermark, which
    releases the unmatched rows with NULL right side."""
    clicks, buys = _split_events(spark, sf_dir)
    cdir, bdir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    clicks.write.parquet(cdir)
    buys.write.parquet(bdir)

    def sweep():
        sl = file_stream(spark, cdir, clicks.schema)
        sr = file_stream(spark, bdir, buys.schema).withColumnRenamed(
            "user_id", "r_user_id")
        sj = stream_stream_join(
            sl, sr, "click_ts", "buy_ts",
            on=F.col("user_id") == F.col("r_user_id"),
            watermark="1 hour", max_lag="30 minutes", how="left_outer",
        ).select("click_id", "user_id", "buy_id", "amount")
        q = (sj.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)

    sweep()
    n_clicks = clicks.count()

    # push the watermark far past every click: one sentinel row per side
    far = clicks.agg(F.max("click_ts").alias("m")).collect()[0]["m"]
    import datetime as dt
    sentinel_ts = far + dt.timedelta(days=365)
    spark.createDataFrame([(10**9, sentinel_ts, -1)], clicks.schema) \
        .write.mode("append").parquet(cdir)
    spark.createDataFrame([(10**9 + 1, sentinel_ts, -1, -0.0)], buys.schema) \
        .write.mode("append").parquet(bdir)
    sweep()

    got = spark.read.parquet(out).filter(F.col("user_id") >= 0)
    # every click appears; unmatched ones carry NULL buy side
    assert got.select("click_id").distinct().count() == n_clicks
    unmatched = got.filter(F.col("buy_id").isNull())
    batch = (clicks.join(
        buys.withColumnRenamed("user_id", "r_user_id"),
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 minutes")),
        "left_outer")
        .select("click_id", "user_id", "buy_id", "amount"))
    assert unmatched.count() == batch.filter(F.col("buy_id").isNull()).count() > 0


def test_stream_stream_full_outer_watermark_delayed(spark, sf_dir, tmp_path):
    """Full-outer stream-stream join: BOTH sides' unmatched rows emit once
    the watermark passes their join window — the last join shape in the
    streaming story (inner and left-outer covered above)."""
    import datetime as dt

    clicks, buys = _split_events(spark, sf_dir)
    cdir, bdir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    clicks.write.parquet(cdir)
    buys.write.parquet(bdir)

    def sweep():
        sl = file_stream(spark, cdir, clicks.schema)
        sr = file_stream(spark, bdir, buys.schema).withColumnRenamed(
            "user_id", "r_user_id")
        sj = stream_stream_join(
            sl, sr, "click_ts", "buy_ts",
            on=F.col("user_id") == F.col("r_user_id"),
            watermark="1 hour", max_lag="30 minutes", how="full_outer",
        ).select("click_id", "user_id", "r_user_id", "buy_id", "amount")
        q = (sj.writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)

    sweep()
    far = clicks.agg(F.max("click_ts").alias("m")).collect()[0]["m"]
    sentinel_ts = far + dt.timedelta(days=365)
    spark.createDataFrame([(10**9, sentinel_ts, -1)], clicks.schema) \
        .write.mode("append").parquet(cdir)
    spark.createDataFrame([(10**9 + 1, sentinel_ts, -1, -0.0)], buys.schema) \
        .write.mode("append").parquet(bdir)
    sweep()

    got = spark.read.parquet(out).filter(
        F.coalesce("user_id", "r_user_id") >= 0)
    batch = (clicks.join(
        buys.withColumnRenamed("user_id", "r_user_id"),
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 minutes")),
        "full_outer")
        .select("click_id", "user_id", "r_user_id", "buy_id", "amount"))
    # both sides complete, and unmatched counts equal the batch truth
    assert got.select("click_id").distinct().count() == \
        batch.select("click_id").distinct().count()
    assert got.select("buy_id").distinct().count() == \
        batch.select("buy_id").distinct().count()
    assert got.filter(F.col("buy_id").isNull()).count() == \
        batch.filter(F.col("buy_id").isNull()).count()
    assert got.filter(F.col("click_id").isNull()).count() == \
        batch.filter(F.col("click_id").isNull()).count() > 0

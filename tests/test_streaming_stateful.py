"""Custom stateful streaming operator: state must persist across separate
micro-batch sweeps through the shared checkpoint."""

from pyspark.sql import functions as F

from activedata_etl_spark.io import load_table
from activedata_etl_spark.streaming.stream import (
    file_stream,
    run_foreach_batch,
    stateful_counts,
)


def test_stateful_counts_across_sweeps(spark, sf_dir, tmp_path):
    src, ckpt, out = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)

    def sweep(batch_df):
        q = (
            stateful_counts(batch_df, "user_id")
            .writeStream.foreachBatch(
                lambda bdf, _bid: bdf.write.mode("append").parquet(out))
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    first.write.mode("append").parquet(src)
    sweep(file_stream(spark, src, first.schema))
    second.write.mode("append").parquet(src)
    sweep(file_stream(spark, src, first.schema))

    # last emitted count per user must equal the user's TOTAL events —
    # proving batch-2 resumed batch-1's state, not started fresh
    latest = (
        spark.read.parquet(out)
        .groupBy("user_id").agg(F.max("n").alias("n"))
    )
    truth = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, latest.collect())) == sorted(map(tuple, truth.collect()))


def test_foreach_batch_multi_sink(spark, sf_dir, tmp_path):
    src = str(tmp_path / "in")
    a, b, ckpt = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "ck")
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    events.write.parquet(src)

    def split_sinks(batch_df, _batch_id):
        batch_df.filter(F.col("event_type") == "error").write.mode("append").parquet(a)
        batch_df.filter(F.col("event_type") != "error").write.mode("append").parquet(b)

    q = run_foreach_batch(file_stream(spark, src, events.schema), split_sinks, ckpt)
    q.awaitTermination(120)
    n_err = spark.read.parquet(a).count()
    n_rest = spark.read.parquet(b).count()
    assert n_err + n_rest == events.count()
    assert n_err == events.filter(F.col("event_type") == "error").count()


def test_event_time_timeout_evicts_state(spark, sf_dir, tmp_path):
    """Keys quiet for longer than the gap close and EVICT once the
    watermark passes their timeout: sweep 1 arms timeouts, a far-future
    sentinel in sweep 2 advances the watermark, and every armed key
    emits its final (n, closed=true) row — bounded state, the property
    that keeps a 100 TB keyspace from living in the store forever."""
    import datetime as dt

    from pyspark.sql import functions as F

    from activedata_etl_spark.io import load_table
    from activedata_etl_spark.streaming.stream import evicting_counts, file_stream

    src, ckpt, out = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    ev.write.parquet(src)

    # gap > the data's time span: closures come only from the sentinel
    # (availableNow may split sweep 1 into several micro-batches, and the
    # watermark advances BETWEEN them — a short gap evicts mid-sweep,
    # correctly, which would make per-key counts restart)
    gap_ms = 30 * 86_400_000

    def sweep():
        q = (evicting_counts(file_stream(spark, src, ev.schema), "user_id", "ts",
                             gap_ms=gap_ms)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)

    sweep()
    got1 = spark.read.parquet(out)
    assert got1.filter("closed").count() == 0  # nothing evicted yet

    far = ev.agg(F.max("ts")).collect()[0][0] + dt.timedelta(days=365)
    spark.createDataFrame([(-1, far)], ev.schema).write.mode("append").parquet(src)
    sweep()

    got2 = spark.read.parquet(out).filter(F.col("user_id") >= 0)
    per_user = ev.groupBy("user_id").count()
    closed = got2.filter("closed")
    # every real key closed exactly once, with its full count
    assert closed.count() == per_user.count()
    joined = closed.join(per_user, "user_id")
    assert joined.filter(F.col("n") != F.col("count")).count() == 0


def test_evicting_counts_string_key(spark, tmp_path):
    """The output key column type must follow the input schema — string
    session/user ids are the docstring's own use case and previously hit
    the hardcoded-bigint output schema."""
    import datetime as dt

    from activedata_etl_spark.streaming.stream import evicting_counts, file_stream

    src, ckpt, out = (str(tmp_path / p) for p in ("in", "ck", "out"))
    base = dt.datetime(2024, 1, 1)
    rows = [(f"user-{i % 3}", base + dt.timedelta(minutes=i)) for i in range(9)]
    ev = spark.createDataFrame(rows, "uid string, ts timestamp")
    ev.write.parquet(src)

    q = (evicting_counts(file_stream(spark, src, ev.schema), "uid", "ts",
                         gap_ms=30 * 86_400_000)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.schema["uid"].dataType.simpleString() == "string"
    final = {r["uid"]: r["n"] for r in got.filter("NOT closed").collect()
             if r["n"] == 3}
    assert set(final) == {"user-0", "user-1", "user-2"}

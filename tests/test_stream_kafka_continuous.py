"""Kafka template wiring + a real continuous-trigger run (rate source)."""

import time

import pytest
from pyspark.sql import functions as F

from activedata_etl_spark.streaming import stream as S


def test_kafka_template_wiring(spark):
    # No kafka connector jar in this environment: the template must fail at
    # SOURCE RESOLUTION (proving the wiring is syntactically sound), not
    # with a Python-side error.
    with pytest.raises(Exception, match="(?i)kafka|DATA_SOURCE_NOT_FOUND"):
        S.kafka_stream(spark, "localhost:9092", "events",
                       value_schema="event_id bigint, ts timestamp")


def test_continuous_trigger_runs(spark, tmp_path):
    src = S.message_stream(spark, rows_per_second=10)
    q = S.run_continuous(
        src,
        lambda df: df.filter(F.col("value") % 2 == 0)
                     .select("timestamp", (F.col("value") * 2).alias("v2")),
        checkpoint=str(tmp_path / "ckpt"),
        interval="1 second",
    )
    try:
        # Continuous mode surfaces progress only at epoch commits, which can
        # lag well past test budget — the meaningful check is that the
        # record-at-a-time query keeps RUNNING (a plan continuous mode can't
        # express would have failed at start or died immediately).
        deadline = time.time() + 10
        while time.time() < deadline and q.isActive and not q.recentProgress:
            time.sleep(0.5)
        assert q.isActive, f"continuous query died: {q.exception()}"
    finally:
        q.stop()


# The message-envelope contract: every broker-ish source (kafka_stream,
# message_stream, a file-backed replay) lands rows in this shape; operator
# code binds ONLY to it, so swapping the source changes zero operator code.
_ENVELOPE = ("key string, value struct<event_id bigint, kind string>, "
             "topic string, partition int, offset bigint, timestamp timestamp")


def _enrich(env):
    """The downstream operator pipeline under test — written once, source
    unknown: filter on payload, project envelope + payload fields."""
    return (env.filter(F.col("value.event_id") % 2 == 0)
            .select("key", F.col("value.event_id").alias("event_id"),
                    F.col("value.kind").alias("kind"), "offset"))


def test_source_swap_changes_no_operator_code(spark, tmp_path):
    import datetime as dt

    rows = [
        (str(i % 3), (i, "click" if i % 2 else "view"), "events", 0, i,
         dt.datetime(2024, 1, 1, 0, 0, i))
        for i in range(20)
    ]
    static_env = spark.createDataFrame(rows, _ENVELOPE)

    # source A: batch frame (what a kafka_stream micro-batch delivers)
    expected = sorted(tuple(r) for r in _enrich(static_env).collect())

    # source B: file-backed stream with the SAME envelope schema, driven
    # through the streaming engine; the SAME _enrich callable applies.
    src_dir = str(tmp_path / "envelope_src")
    static_env.write.parquet(src_dir)
    stream_src = S.file_stream(spark, src_dir, static_env.schema)
    got = []
    q = S.run_foreach_batch(
        _enrich(stream_src),
        lambda batch, _id: got.extend(tuple(r) for r in batch.collect()),
        checkpoint=str(tmp_path / "ckpt_swap"),
    )
    q.awaitTermination(60)
    assert sorted(got) == expected
    # and the kafka template emits exactly this envelope contract
    # (construction fails here only for lack of the connector jar, which
    # test_kafka_template_wiring pins down)


def test_socket_stream_source_swap(spark, tmp_path):
    """The envelope contract over a REAL network transport: a TCP server
    (the sandbox's broker stand-in) pushes NDJSON envelopes, the socket
    source parses them into the standard envelope, and the SAME _enrich
    pipeline produces the same rows as the batch/file sources — live
    source-swap invariance over an actual socket, not just a schema."""
    import json
    import socket
    import threading

    msgs = [
        {"key": str(i % 3),
         "value": {"event_id": i, "kind": "click" if i % 2 else "view"},
         "topic": "events", "partition": 0, "offset": i,
         "timestamp": f"2024-01-01T00:00:{i:02d}"}
        for i in range(20)
    ]

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall("".join(json.dumps(m) + "\n" for m in msgs).encode())
            stop.wait(60)  # keep the connection open while Spark reads

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    try:
        env = S.socket_stream(spark, "127.0.0.1", port,
                              value_schema="event_id bigint, kind string")
        got = []
        # available_now=False: the socket source has no bounded "all
        # available" offset range - it must run as a plain micro-batch
        # stream and be stopped by the test
        q = S.run_foreach_batch(
            _enrich(env),
            lambda batch, _id: got.extend(tuple(r) for r in batch.collect()),
            checkpoint=str(tmp_path / "ckpt_socket"),
            available_now=False,
        )
        import time as _time

        deadline = _time.time() + 60
        while _time.time() < deadline and len(got) < 10:
            _time.sleep(0.5)
        q.stop()
    finally:
        stop.set()
        srv.close()
    want = [(str(i % 3), i, "view" if i % 2 == 0 else "click", i)
            for i in range(0, 20, 2)]
    assert sorted(got) == sorted(want)

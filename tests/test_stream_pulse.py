"""Pulse/AMQP listener emulation (streaming/pulse.py): durable spool,
replay-from-offset subscriptions, live tail, at-least-once redelivery
deduped at the consumer — batch-equivalence against the spool truth,
the same test pattern as the other streaming ops."""

import json
import time

from pyspark.sql import functions as F

from activedata_etl_spark.streaming import stream as S
from activedata_etl_spark.streaming.pulse import PulseBroker, pulse_stream

_VALUE = "event_id bigint, kind string"
_ENVELOPE = (f"key string, value struct<{_VALUE}>, topic string, "
             "partition int, offset bigint, timestamp timestamp")


def _consume(spark, tmp_path, port, name, n_expected, timeout=90):
    got = []
    env = pulse_stream(spark, "127.0.0.1", port, value_schema=_VALUE)
    proj = env.select("key", F.col("value.event_id").alias("event_id"),
                      F.col("value.kind").alias("kind"), "offset")
    q = S.run_foreach_batch(
        proj,
        lambda batch, _id: got.extend(tuple(r) for r in batch.collect()),
        checkpoint=str(tmp_path / f"ckpt_{name}"),
        available_now=False,
    )
    deadline = time.time() + timeout
    while time.time() < deadline and len(got) < n_expected:
        time.sleep(0.5)
    q.stop()
    return got


def _publish(broker, i):
    return broker.publish(
        "events", str(i % 3),
        {"event_id": i, "kind": "click" if i % 2 else "view"},
        timestamp=f"2024-01-01T00:00:{i % 60:02d}")


def test_pulse_redelivery_deduped_matches_spool(spark, tmp_path):
    """Publish 15 before + 5 during the stream (live tail), with the
    broker redelivering its last 5 unacked messages (at-least-once);
    the deduped consumer must equal a BATCH read of the durable spool —
    and a second topic must not leak into the subscription."""
    broker = PulseBroker(str(tmp_path / "bus"), redeliver_last=5)
    try:
        for i in range(15):
            _publish(broker, i)
        broker.publish("other", "x", {"event_id": 999, "kind": "noise"})
        port = broker.listen("events", from_offset=0)

        import threading

        def late_publishes():
            time.sleep(2)
            for i in range(15, 20):
                _publish(broker, i)

        threading.Thread(target=late_publishes, daemon=True).start()
        got = _consume(spark, tmp_path, port, "main", n_expected=20)
    finally:
        broker.stop()

    # batch truth straight from the durable spool file
    spool = spark.read.schema(_ENVELOPE).json(
        str(tmp_path / "bus" / "spool.ndjson"))
    want = sorted(
        tuple(r) for r in
        spool.filter(F.col("topic") == "events")
        .select("key", F.col("value.event_id").alias("event_id"),
                F.col("value.kind").alias("kind"), "offset").collect())
    assert sorted(got) == want  # dedup absorbed the 5 redeliveries
    assert len(got) == 20


def test_pulse_replay_anchor(spark, tmp_path):
    """A subscription anchored at offset 10 replays only the suffix —
    the durable-queue recover semantics the reference's listener gets
    from AMQP."""
    broker = PulseBroker(str(tmp_path / "bus2"))
    try:
        for i in range(20):
            _publish(broker, i)
        port = broker.listen("events", from_offset=10)
        got = _consume(spark, tmp_path, port, "anchor", n_expected=10)
    finally:
        broker.stop()
    assert sorted(r[3] for r in got) == list(range(10, 20))


def test_pulse_raw_mode_shows_redelivery(spark, tmp_path):
    """dedup_within=None exposes the raw at-least-once feed: the
    redelivered tail arrives twice — proving the dedup in the main test
    is doing real work, not that the broker never redelivers."""
    broker = PulseBroker(str(tmp_path / "bus3"), redeliver_last=3)
    try:
        for i in range(8):
            _publish(broker, i)
        port = broker.listen("events", from_offset=0)
        got = []
        env = pulse_stream(spark, "127.0.0.1", port, value_schema=_VALUE,
                           dedup_within=None)
        q = S.run_foreach_batch(
            env.select("offset"),
            lambda batch, _id: got.extend(r["offset"] for r in batch.collect()),
            checkpoint=str(tmp_path / "ckpt_raw"),
            available_now=False,
        )
        deadline = time.time() + 90
        while time.time() < deadline and len(got) < 11:
            time.sleep(0.5)
        q.stop()
    finally:
        broker.stop()
    assert sorted(got) == sorted(list(range(8)) + [5, 6, 7])


def test_noop_sink_drains_and_checkpoints(spark, tmp_path):
    """Dummy sink: the noop-format stream fully drains the source
    (progress shows every input row processed) and advances the
    checkpoint — rerunning against the same files processes nothing."""
    df = spark.range(100).selectExpr("id", "id % 7 AS k")
    src_dir = str(tmp_path / "noop_src")
    df.write.parquet(src_dir)
    src = S.file_stream(spark, src_dir, df.schema)
    ckpt = str(tmp_path / "ckpt_noop")
    q = S.run_noop(src.groupBy("k").count(), checkpoint=ckpt,
                   output_mode="complete")
    q.awaitTermination(60)
    assert sum(p["numInputRows"] for p in q.recentProgress) == 100
    q2 = S.run_noop(S.file_stream(spark, src_dir, df.schema)
                    .groupBy("k").count(), checkpoint=ckpt,
                    output_mode="complete")
    q2.awaitTermination(60)
    assert sum(p["numInputRows"] for p in q2.recentProgress) == 0


def test_broker_restart_continues_offsets(tmp_path):
    """A restarted broker over an existing spool must CONTINUE each
    topic's offset sequence (r9 review): reissuing offset 0 for a
    distinct new message would make the consumer dedup drop it."""
    b1 = PulseBroker(str(tmp_path / "bus4"))
    offs1 = [_publish(b1, i) for i in range(5)]
    b1.publish("other", "x", {"event_id": 1, "kind": "k"})
    b1.stop()
    b2 = PulseBroker(str(tmp_path / "bus4"))  # restart over the spool
    try:
        assert offs1 == list(range(5))
        assert _publish(b2, 5) == 5          # continues, not 0
        assert b2.publish("other", "y", {"event_id": 2, "kind": "k"}) == 1
        # spool offsets are strictly sequential per topic
        spool = (tmp_path / "bus4" / "spool.ndjson").read_text().splitlines()
        per = {}
        for ln in spool:
            m = json.loads(ln)
            per.setdefault(m["topic"], []).append(m["offset"])
        assert per["events"] == list(range(6))
        assert per["other"] == [0, 1]
    finally:
        b2.stop()

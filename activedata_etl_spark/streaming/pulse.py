"""Pulse/AMQP listener emulation — the reference's message-bus source
(``vendor/pyLibrary/env/pulse.py``: a durable-queue consumer over
Mozilla Pulse, i.e. RabbitMQ) re-expressed for an environment with no
broker install, using a REAL network transport and the broker semantics
that matter to the consumer:

- **durable spool**: every published envelope appends to an NDJSON
  spool file — the emulated exchange's durable queue. Offsets are spool
  line numbers, so the bus is REPLAYABLE (the property the reference
  leans on when a worker dies mid-batch and the queue redelivers).
- **per-subscriber replay-from-offset**: each listener port serves one
  subscription (topic, from_offset); every (re)connection replays the
  spool from the subscriber's anchor then live-tails new publishes —
  exactly AMQP's basic.consume on a durable queue after basic.recover.
- **at-least-once → exactly-once at the sink**: redelivery means
  duplicates; the envelope carries (topic, partition, offset), so
  :func:`pulse_stream` drops duplicates within a watermark — the same
  move the reference makes by writing to ES keyed on ``_id`` (document
  overwrite makes redelivery idempotent).

The Spark side is :func:`stream.socket_stream`'s envelope, so consumers
bind once and a production Kafka/Pulsar swap (kafka_stream) changes
zero operator code. Spark's socket source is a driver-side test
transport with no offset tracking of its own — which is precisely why
the broker's replay anchor + sink-side dedup carry the delivery
semantics here; the kafka connector replaces both with source offsets.

Scale note: a socket source is a single-connection feed — fine for the
control-plane message volumes Pulse carries in the reference (task
notifications, not data). The DATA path at 100 TB is the file/object
queue (stream.file_stream + run_incremental); this module closes the
notification-bus row, it is not a bulk transport.
"""

from __future__ import annotations

import json
import os
import socket
import threading
import time

from pyspark.sql import DataFrame, SparkSession


class PulseBroker:
    """In-process message-bus emulation: durable NDJSON spool + TCP
    fan-out with per-subscription replay. One instance ≈ one AMQP
    exchange with durable queues.

    ``redeliver_last`` simulates at-least-once redelivery: after the
    replay catches up to the spool head, the last N already-sent
    messages are sent AGAIN (what a broker does when a consumer dies
    before acking) — tests drive the consumer-side dedup with it.
    ``rate_per_sec`` bounds the send rate (the reference's listener is
    rate-limited by the broker's prefetch window)."""

    def __init__(self, spool_dir: str, rate_per_sec: float | None = None,
                 redeliver_last: int = 0):
        os.makedirs(spool_dir, exist_ok=True)
        self._spool = os.path.join(spool_dir, "spool.ndjson")
        self._lock = threading.Lock()
        # rehydrate per-topic next-offsets from an existing spool — a
        # restarted broker must continue the offset sequence, or it
        # reissues duplicate offsets for DISTINCT messages and the
        # consumer-side dedup wrongly drops them (r9 review finding #3)
        self._offsets: dict[str, int] = {}
        if os.path.exists(self._spool):
            with open(self._spool) as f:
                for ln in f:
                    m = json.loads(ln)
                    nxt = m["offset"] + 1
                    if nxt > self._offsets.get(m["topic"], 0):
                        self._offsets[m["topic"]] = nxt
        self._rate = rate_per_sec
        self._redeliver = redeliver_last
        self._stop = threading.Event()
        self._servers: list[socket.socket] = []
        self._threads: list[threading.Thread] = []

    # -- publisher side ------------------------------------------------
    def publish(self, topic: str, key: str, value: dict,
                timestamp: str | None = None) -> int:
        """Append one envelope to the durable spool; returns its offset
        (per-topic, monotone — the AMQP delivery tag analog)."""
        with self._lock:
            off = self._offsets.get(topic, 0)
            self._offsets[topic] = off + 1
            env = {"key": key, "value": value, "topic": topic,
                   "partition": 0, "offset": off,
                   "timestamp": timestamp or
                   time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime())}
            with open(self._spool, "a") as f:
                f.write(json.dumps(env) + "\n")
        return off

    def _read_spool_from(self, topic: str, from_offset: int,
                         pos: int) -> tuple[list[str], int]:
        """Matching lines APPENDED after byte position ``pos`` (and the
        new position) — each poll reads and parses only new bytes, not
        the whole spool (a 50 ms whole-file reread per connection is
        O(total²) parsing under the lock; r9 review finding #8)."""
        if not os.path.exists(self._spool):
            return [], pos
        with self._lock:
            with open(self._spool) as f:
                f.seek(pos)
                chunk = f.read()
                new_pos = f.tell()
        out = []
        for ln in chunk.splitlines(keepends=True):
            if not ln.endswith("\n"):
                # torn tail write: re-read it next poll
                new_pos -= len(ln.encode())
                break
            m = json.loads(ln)
            if m["topic"] == topic and m["offset"] >= from_offset:
                out.append(ln)
        return out, new_pos

    # -- subscriber side -----------------------------------------------
    def listen(self, topic: str, from_offset: int = 0) -> int:
        """Open one subscription; returns the TCP port. Every client
        (re)connection replays the spool from ``from_offset`` then
        live-tails — reconnection therefore REDELIVERS, and so does
        ``redeliver_last`` within one connection; consumers dedup on
        (topic, partition, offset)."""
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(4)
        srv.settimeout(0.2)
        port = srv.getsockname()[1]
        self._servers.append(srv)

        def serve() -> None:
            while not self._stop.is_set():
                try:
                    conn, _ = srv.accept()
                except (socket.timeout, OSError):
                    continue
                t = threading.Thread(target=self._feed, daemon=True,
                                     args=(conn, topic, from_offset))
                t.start()
                self._threads.append(t)

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        self._threads.append(t)
        return port

    def _feed(self, conn: socket.socket, topic: str, anchor: int) -> None:
        pos = 0  # spool byte position already examined this connection
        delivered: list[str] = []
        redelivered = False
        try:
            with conn:
                while not self._stop.is_set():
                    new, pos = self._read_spool_from(topic, anchor, pos)
                    for ln in new:
                        conn.sendall(ln.encode())
                        delivered.append(ln)
                        if self._rate:
                            time.sleep(1.0 / self._rate)
                    if new:
                        continue  # drained a batch; check again at once
                    if not redelivered and self._redeliver and delivered:
                        # caught up: simulate unacked-message redelivery
                        for ln in delivered[-self._redeliver:]:
                            conn.sendall(ln.encode())
                        redelivered = True
                    self._stop.wait(0.05)  # live-tail poll
        except OSError:
            pass  # client went away; subscription stays open for reconnect

    def stop(self) -> None:
        self._stop.set()
        for s in self._servers:
            try:
                s.close()
            except OSError:
                pass


def pulse_stream(spark: SparkSession, host: str, port: int,
                 value_schema: str | None = None,
                 dedup_within: str | None = "10 minutes") -> DataFrame:
    """Consume one PulseBroker subscription as a streaming DataFrame in
    the standard broker envelope, with redelivered duplicates dropped.

    ``dedup_within`` bounds the dedup state by event time — duplicates
    arriving later than the watermark delay are NOT caught (the same
    contract as dropDuplicatesWithinWatermark everywhere else; broker
    redelivery happens promptly, so a generous delay is cheap). Pass
    ``None`` for raw at-least-once delivery."""
    from . import stream as S

    env = S.socket_stream(spark, host, port, value_schema=value_schema)
    if dedup_within is None:
        return env
    return (env.withWatermark("timestamp", dedup_within)
            .dropDuplicatesWithinWatermark(["topic", "partition", "offset"]))

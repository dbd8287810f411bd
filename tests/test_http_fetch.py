"""sources/http.py — ranged/retried artifact fetch against a local server."""

import gzip
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from activedata_etl_spark.sources.http import FetchError, fetch, fetch_many

BODY = b"0123456789" * 5000  # 50 KB artifact


class _Handler(BaseHTTPRequestHandler):
    """Scriptable artifact server: per-path behaviors set on the class."""
    behaviors = {}       # path -> list of modes consumed per request
    bodies = {}          # path -> bytes
    etags = {}           # path -> ETag header value (optional)
    next_bodies = {}     # path -> (body, etag) swapped in by truncate_swap
    ignore_ifrange = set()  # paths whose server honors Range but not If-Range

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        body = self.bodies.get(self.path, BODY)
        etag = self.etags.get(self.path)
        modes = self.behaviors.get(self.path)
        mode = modes.pop(0) if modes else "ok"
        if mode in ("404", "500", "408"):
            self.send_error(int(mode))
            return
        rng = self.headers.get("Range")
        if_range = self.headers.get("If-Range")
        start = 0
        if (rng and mode != "ignore_range"
                and not (if_range and etag and if_range != etag
                         and self.path not in self.ignore_ifrange)):
            # honor the range — unless a compliant If-Range mismatch
            # demands the full current body instead
            start = int(rng.split("=")[1].rstrip("-"))
            self.send_response(206)
        else:
            self.send_response(200)
        payload = body[start:]
        if etag:
            self.send_header("ETag", etag)
        if mode == "truncate_swap":
            # after this (truncated) response, the artifact changes
            self.bodies[self.path], self.etags[self.path] = \
                self.next_bodies[self.path]
        if mode in ("truncate", "truncate_swap"):
            # advertise the full length but cut the connection halfway
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload[: len(payload) // 2])
            self.wfile.flush()
            self.connection.close()
            return
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_plain_fetch(server, tmp_path):
    dest = str(tmp_path / "a.bin")
    assert fetch(f"{server}/plain", dest) == dest
    assert open(dest, "rb").read() == BODY
    assert not os.path.exists(dest + ".fetch_tmp")


def test_resume_after_truncation(server, tmp_path):
    """A cut connection retries with a Range header and the staged bytes
    survive — the second attempt fetches only the missing tail."""
    _Handler.behaviors["/trunc"] = ["truncate"]
    dest = str(tmp_path / "b.bin")
    fetch(f"{server}/trunc", dest, backoff=0.01)
    assert open(dest, "rb").read() == BODY


def test_range_ignoring_server_restarts_clean(server, tmp_path):
    """Ranged retry against a server that answers 200 (ignores Range)
    must restart the file, not append a duplicate prefix."""
    _Handler.behaviors["/norange"] = ["truncate", "ignore_range"]
    dest = str(tmp_path / "c.bin")
    fetch(f"{server}/norange", dest, backoff=0.01)
    assert open(dest, "rb").read() == BODY


def test_404_raises_immediately(server, tmp_path):
    _Handler.behaviors["/gone"] = ["404", "404", "404"]
    with pytest.raises(FetchError, match="HTTP 404"):
        fetch(f"{server}/gone", str(tmp_path / "d.bin"), backoff=0.01)
    # only ONE request consumed — no retry on 4xx
    assert _Handler.behaviors["/gone"] == ["404", "404"]


def test_5xx_retries_then_succeeds(server, tmp_path):
    _Handler.behaviors["/flaky"] = ["500", "500"]
    dest = str(tmp_path / "e.bin")
    fetch(f"{server}/flaky", dest, backoff=0.01)
    assert open(dest, "rb").read() == BODY


def test_retry_budget_exhausted(server, tmp_path):
    _Handler.behaviors["/dead"] = ["500"] * 10
    with pytest.raises(FetchError, match="exhausted"):
        fetch(f"{server}/dead", str(tmp_path / "f.bin"),
              retries=2, backoff=0.01)
    assert not os.path.exists(str(tmp_path / "f.bin"))


def test_no_partial_dest_ever(server, tmp_path):
    """dest must not exist until the bytes are complete (atomic rename)."""
    _Handler.behaviors["/part"] = ["truncate"] * 10
    dest = str(tmp_path / "g.bin")
    with pytest.raises(FetchError):
        fetch(f"{server}/part", dest, retries=1, backoff=0.01)
    assert not os.path.exists(dest)


BODY2 = b"abcdefghij" * 6000  # a CHANGED 60 KB artifact (v2)


def test_408_retries_like_5xx(server, tmp_path):
    """408 Request Timeout is transient — retried, not fail-fast."""
    _Handler.behaviors["/slow"] = ["408"]
    dest = str(tmp_path / "h.bin")
    fetch(f"{server}/slow", dest, backoff=0.01)
    assert open(dest, "rb").read() == BODY
    assert _Handler.behaviors["/slow"] == []  # the 408 was consumed, then retried


def test_changed_artifact_compliant_ifrange(server, tmp_path):
    """Artifact changes between the truncated first attempt and the
    resume: a compliant server sees the If-Range mismatch and answers
    200 with the FULL new body — the client restarts clean and publishes
    v2, never a v1-prefix/v2-tail splice."""
    _Handler.bodies["/swap1"] = BODY
    _Handler.etags["/swap1"] = '"v1"'
    _Handler.next_bodies["/swap1"] = (BODY2, '"v2"')
    _Handler.behaviors["/swap1"] = ["truncate_swap"]
    dest = str(tmp_path / "i.bin")
    fetch(f"{server}/swap1", dest, backoff=0.01)
    assert open(dest, "rb").read() == BODY2


def test_changed_artifact_ifrange_ignoring_server(server, tmp_path):
    """Same change, but the server honors Range while ignoring If-Range
    (answers 206 of the NEW version with its new ETag). The client must
    detect the validator mismatch, discard the stage, and refetch whole
    — the mid-file slice of v2 is unusable at any offset."""
    _Handler.bodies["/swap2"] = BODY
    _Handler.etags["/swap2"] = '"v1"'
    _Handler.next_bodies["/swap2"] = (BODY2, '"v2"')
    _Handler.behaviors["/swap2"] = ["truncate_swap"]
    _Handler.ignore_ifrange.add("/swap2")
    dest = str(tmp_path / "j.bin")
    fetch(f"{server}/swap2", dest, backoff=0.01)
    assert open(dest, "rb").read() == BODY2


def test_unchanged_artifact_resumes_with_ifrange(server, tmp_path):
    """Validator present and unchanged: resume still appends only the
    missing tail (206), not a full refetch."""
    _Handler.bodies["/keep"] = BODY
    _Handler.etags["/keep"] = '"same"'
    _Handler.behaviors["/keep"] = ["truncate"]
    dest = str(tmp_path / "k.bin")
    fetch(f"{server}/keep", dest, backoff=0.01)
    assert open(dest, "rb").read() == BODY


def test_fetch_many(server, tmp_path):
    pairs = [(f"{server}/m{i}", str(tmp_path / f"m{i}.bin")) for i in range(5)]
    got = fetch_many(pairs, max_workers=3)
    assert got == [d for _, d in pairs]
    assert all(open(d, "rb").read() == BODY for d in got)


def test_fetched_gz_jsonl_reads_into_spark(server, tmp_path, spark):
    """End-to-end ingest: fetch a gz-JSONL artifact (the reference's
    block format), then read it with the jsonl source."""
    from activedata_etl_spark.sources.jsonl import read_jsonl

    docs = [{"id": i, "ok": i % 2 == 0} for i in range(100)]
    _Handler.bodies["/block.json.gz"] = gzip.compress(
        "\n".join(json.dumps(d) for d in docs).encode())
    dest = str(tmp_path / "block.json.gz")
    fetch(f"{server}/block.json.gz", dest)
    df = read_jsonl(spark, dest)
    assert df.count() == 100
    assert df.filter("ok").count() == 50

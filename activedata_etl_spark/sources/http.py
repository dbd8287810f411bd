"""HTTP artifact fetch — the last §2.1 inventory row.

The reference's ETL workers pull raw CI artifacts (task logs, coverage
files) over HTTP before transforming them (public ActiveData-ETL symbols:
``vendor/mo_http/http.py :: get / get_json`` with retry/backoff, and the
Taskcluster artifact fetches in ``activedata_etl/imports``). In a Spark
engine this is a DRIVER-SIDE ingest step — fetch to a local staging file,
then ``spark.read`` the staged path — so the module is deliberately small
stdlib code, not a distributed operator:

- **ranged GET with resume**: a retried attempt continues from the bytes
  already staged (``Range: bytes=<offset>-``) instead of refetching, the
  behavior that matters for multi-GB coverage artifacts on flaky links.
  Servers that ignore Range (HTTP 200 to a ranged request) restart the
  file cleanly.
- **validated resume**: the first response's ETag (or Last-Modified) is
  captured and sent as ``If-Range`` on every resumed attempt — a
  compliant server answers 200-with-full-body when the artifact changed
  mid-fetch (we restart from zero) instead of 206-appending new-version
  bytes onto old-version bytes. For servers that ignore ``If-Range``,
  the response validator is compared directly and a mismatch also
  restarts from zero. Without any validator, resume still works but is
  unvalidated (same as curl -C -).
- **bounded retries with backoff**: transient failures (connection reset,
  5xx, 408/429, short read) retry up to ``retries`` times with
  exponential backoff; other 4xx raise immediately (retrying a 404 is
  wasted time).
- **atomic publication**: bytes stream into ``<dest>.fetch_tmp`` and
  rename over ``dest`` only when the byte count matches the server's
  Content-Length (when provided) — readers of ``dest`` never see a
  partial artifact, the same never-serve-partial contract as
  ``ext/iosafe.atomic_rewrite``.

``fetch_many`` fans a small artifact list out driver-side (thread pool —
these are I/O waits, not CPU); a CLUSTER-SCALE artifact list should go
through the SQS/file-queue streaming pipeline instead (one work item per
artifact, fetch inside foreachBatch), which is how the reference's ETL
fleet actually parallelizes fetches.
"""

from __future__ import annotations

import os
import time
import urllib.error
import urllib.request

_TMP_SUFFIX = ".fetch_tmp"
_CHUNK = 1 << 20


class FetchError(Exception):
    """Raised when an artifact cannot be fetched within the retry budget."""


def _validator(resp) -> str | None:
    """Resume validator for a response: strong-preferred ETag, else
    Last-Modified (RFC 9110 §13.1.3 If-Range accepts either)."""
    return resp.headers.get("ETag") or resp.headers.get("Last-Modified")


def _attempt(url: str, tmp: str, timeout: float, headers: dict[str, str],
             state: dict) -> tuple[bool, int | None]:
    """One fetch attempt, resuming from the staged offset. Returns
    (complete, expected_total); raises urllib/OSError on transport
    failure so the caller's retry loop owns the policy.

    ``state`` carries the resume validator across attempts within one
    fetch(): ``state["validator"]`` is the ETag/Last-Modified captured
    when byte 0 was written. A resumed attempt sends it as ``If-Range``
    (compliant servers then return 200-full-body when the artifact
    changed — never a mismatched 206), and additionally compares the
    response's own validator, restarting from zero on any mismatch, so
    Range-honoring-but-If-Range-ignoring servers can't splice two
    artifact versions into one staged file."""
    offset = os.path.getsize(tmp) if os.path.exists(tmp) else 0
    req_headers = dict(headers)
    if offset:
        req_headers["Range"] = f"bytes={offset}-"
        if state.get("validator"):
            req_headers["If-Range"] = state["validator"]
    req = urllib.request.Request(url, headers=req_headers)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        if offset and resp.status == 200:
            # server ignored Range, or If-Range detected a changed
            # artifact — either way this is the full body: restart
            offset = 0
        resp_validator = _validator(resp)
        if (offset and state.get("validator") and resp_validator
                and resp_validator != state["validator"]):
            # 206 from a server that ignored If-Range but the artifact
            # changed under us — this body is a MID-FILE slice of the
            # new version, unusable at any offset: drop the stage and
            # the stale validator, retry fetches the new version whole
            os.unlink(tmp)
            state["validator"] = None
            return False, None
        if not offset:
            state["validator"] = resp_validator
        mode = "ab" if offset else "wb"
        length = resp.headers.get("Content-Length")
        expected = offset + int(length) if length is not None else None
        with open(tmp, mode) as out:
            while True:
                chunk = resp.read(_CHUNK)
                if not chunk:
                    break
                out.write(chunk)
    got = os.path.getsize(tmp)
    if expected is not None and got < expected:
        return False, expected  # short read — resumable, retry
    return True, expected


def fetch(url: str, dest: str, retries: int = 4, timeout: float = 30.0,
          backoff: float = 0.5, headers: dict[str, str] | None = None) -> str:
    """Fetch ``url`` to ``dest`` (local path) with resume + retries and
    atomic rename publication. Returns ``dest``. Idempotent: an existing
    complete ``dest`` is left alone only by the caller's choice — this
    always refetches (ETL replays want current bytes; skip-if-present is
    one ``os.path.exists`` at the call site)."""
    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    tmp = dest + _TMP_SUFFIX
    if os.path.exists(tmp):
        os.unlink(tmp)  # a previous crash's stage; offsets aren't trusted
        # across processes (no etag/mtime validation) so start clean
    headers = headers or {}
    state: dict = {"validator": None}
    last_err: Exception | None = None
    for attempt in range(retries + 1):
        if attempt:
            time.sleep(backoff * (2 ** (attempt - 1)))
        try:
            complete, _ = _attempt(url, tmp, timeout, headers, state)
            if complete:
                os.replace(tmp, dest)  # atomic: readers never see partial
                return dest
            last_err = FetchError(f"short read from {url}")
        except urllib.error.HTTPError as e:
            # 408 (request timeout) and 429 (rate limit) are transient
            # like 5xx; the rest of 4xx will fail identically on retry
            if 400 <= e.code < 500 and e.code not in (408, 429):
                raise FetchError(f"{url}: HTTP {e.code}") from e
            last_err = e
        except (urllib.error.URLError, OSError, TimeoutError) as e:
            last_err = e
    raise FetchError(
        f"{url}: exhausted {retries} retries ({last_err})") from last_err


def fetch_many(urls_dests: list[tuple[str, str]], retries: int = 4,
               timeout: float = 30.0, max_workers: int = 8) -> list[str]:
    """Fetch a small artifact list concurrently (driver-side thread pool
    — pure I/O wait). For thousands of artifacts use the streaming
    work-queue pipeline instead; this is the interactive/backfill path."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(
            lambda ud: fetch(ud[0], ud[1], retries=retries, timeout=timeout),
            urls_dests))

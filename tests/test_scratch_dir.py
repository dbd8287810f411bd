"""scratch_dir keys persisted-index completion markers on a CONTENT
fingerprint of the source data (r7 ADVICE #5): a dataset regenerated
with different content at the same sf-dir name must get a fresh
directory, not silently serve a stale index."""

import os

from activedata_etl_spark.queries.registry import scratch_dir


def test_fingerprint_changes_with_content(tmp_path):
    d = tmp_path / "sf_test"
    d.mkdir()
    (d / "documents.parquet").write_bytes(b"one")
    a = scratch_dir(str(d), "kind")
    # same content, same dir → stable key (markers survive reruns)
    assert scratch_dir(str(d), "kind") == a
    # rewrite with different content (size change) → new key
    (d / "documents.parquet").write_bytes(b"other-bytes")
    b = scratch_dir(str(d), "kind")
    assert b != a
    # the key carries the human-readable sf name and the kind
    base = os.path.basename(b)
    assert base.startswith("spark_graft_kind_sf_test_")


def test_fingerprint_distinguishes_paths(tmp_path):
    d1 = tmp_path / "a" / "sf0.1"
    d2 = tmp_path / "b" / "sf0.1"
    for d in (d1, d2):
        d.mkdir(parents=True)
        (d / "t.parquet").write_bytes(b"same")
    assert scratch_dir(str(d1), "k") != scratch_dir(str(d2), "k")


def test_ensure_built_self_heals_killed_build(tmp_path):
    """A dir left by a killed build (no completion marker — e.g. only
    Spark's _temporary) must be wiped and rebuilt, not served; a
    completed build must not rebuild."""
    from activedata_etl_spark.queries.registry import ensure_built

    path = str(tmp_path / "idx")
    # simulate a killed Spark write: dir exists, only _temporary inside
    (tmp_path / "idx" / "_temporary").mkdir(parents=True)
    calls = []

    def build():
        calls.append(1)
        (tmp_path / "idx").mkdir(exist_ok=True)
        (tmp_path / "idx" / "part-0.parquet").write_text("data")

    ensure_built(path, build)
    assert calls == [1]
    assert not (tmp_path / "idx" / "_temporary").exists()  # wiped
    assert (tmp_path / "idx" / "part-0.parquet").exists()
    assert (tmp_path / "idx" / "_GRAFT_COMPLETE").exists()
    ensure_built(path, build)  # second call: marker present, no rebuild
    assert calls == [1]

"""drain_available_now service hygiene: the AvailableNow drain must be
BOUNDED (a timeout stops the query and raises — a partial memory table
or spill is never served as the complete batch-equivalent answer) and
LEAK-FREE (per-request checkpoint/spill temp dirs are removed once the
result is materialized, so a long-lived service doesn't fill disk)."""

import glob
import os
import tempfile

import pytest

from pyspark.sql import functions as F

from activedata_etl_spark.streaming import stream as ST


def _drain_dirs() -> set[str]:
    t = tempfile.gettempdir()
    return set(glob.glob(os.path.join(t, "ad_drain_*")))


def _events_stream(spark, sf_dir, tmp_path):
    events = (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
              .select("event_id", "user_id", "event_type"))
    inbox = str(tmp_path / "inbox")
    events.write.parquet(inbox)
    return events, ST.file_stream(spark, inbox, events.schema)


def test_drain_cleans_temp_dirs_aggregate_path(spark, sf_dir, tmp_path):
    events, sdf = _events_stream(spark, sf_dir, tmp_path)
    before = _drain_dirs()
    agg = sdf.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    out = ST.drain_available_now(agg)
    batch = {(r["event_type"], r["n"]) for r in
             events.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert {(r["event_type"], r["n"]) for r in out.collect()} == batch
    assert _drain_dirs() == before  # no leaked checkpoint dirs


def test_drain_cleans_temp_dirs_append_path(spark, sf_dir, tmp_path):
    events, sdf = _events_stream(spark, sf_dir, tmp_path)
    before = _drain_dirs()
    # non-aggregating plan → rejects complete mode → parquet spill path
    out = ST.drain_available_now(sdf.filter(F.col("user_id") >= 10))
    assert out.count() == events.filter(F.col("user_id") >= 10).count()
    # spill + both checkpoint dirs removed even though the result is
    # still readable (localCheckpoint moved it to executor block storage)
    assert _drain_dirs() == before
    assert out.count() > 0  # readable after cleanup


def test_drain_timeout_raises_not_partial(spark, sf_dir, tmp_path):
    _, sdf = _events_stream(spark, sf_dir, tmp_path)
    before = _drain_dirs()
    agg = sdf.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    # a 10ms budget cannot finish a real drain (query start alone takes
    # longer): must raise, never return a partial memory table
    with pytest.raises(TimeoutError):
        ST.drain_available_now(agg, timeout_sec=0.01)
    assert _drain_dirs() == before

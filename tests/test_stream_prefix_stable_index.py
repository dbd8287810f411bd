"""Streaming maintenance of the STABLE-ORDER prefix index: the element
order is frozen from the FIRST batch, later batches are positioned
under that stale order at ingest, and the delta join over the streamed
index equals the from-scratch answer (the prefix lemma holds for ANY
consistent order — staleness costs candidate volume, never a pair).
At-least-once replay changes nothing: positioned rows are deterministic
per doc given the frozen order, and each batch OVERWRITES its own
batch-keyed directory, so a replay rewrites identical bytes (the CMS
idempotence pattern) — no read-time dedup shuffle."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.ext import dedup as DD
from activedata_etl_spark.streaming import stream as ST


def test_stream_stable_index_delta_equals_scratch(spark, sf_dir, tmp_path):
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    stored = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    inbox = str(tmp_path / "inbox")
    idx = str(tmp_path / "idx")
    order = str(tmp_path / "order")
    stored.filter(F.col("doc_id") % 2 == 0).write.parquet(inbox)

    seen = []

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        if not seen:
            # order frozen from the FIRST batch only — every later
            # batch makes it staler
            DD.freeze_prefix_order(batch_df, "doc_id", "text", order)
        DD.append_positioned_index(batch_df, "doc_id", "text", idx,
                                   len(seen), spark, order)
        seen.append(batch_id)

    q = ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                             ingest, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    stored.filter(F.col("doc_id") % 2 == 1).write.mode("append") \
        .parquet(inbox)
    q2 = ST.run_foreach_batch(ST.file_stream(spark, inbox, docs.schema),
                              ingest, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert len(seen) >= 2  # the order really is stale for batch >= 1

    def pairs():
        return sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in
            DD.prefix_join_stable_delta(spark, idx, order, delta,
                                        "doc_id", "text",
                                        threshold=0.5).collect())

    full = DD.prefix_filter_pairs(docs, "doc_id", "text", threshold=0.5)
    scratch = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in full.collect()
        if r["id_a"] % 3 == 0 or r["id_b"] % 3 == 0)
    assert pairs() == scratch and len(scratch) > 0

    # at-least-once replay: re-ingesting a batch overwrites its own
    # batch-keyed directory with identical bytes — a no-op
    DD.append_positioned_index(stored.filter(F.col("doc_id") % 2 == 0),
                               "doc_id", "text", idx, 0, spark, order)
    assert pairs() == scratch

    # staleness report: batches 1+ contribute df the frozen order never
    # saw, so drift is non-zero and new elements exist
    st = DD.prefix_order_staleness(spark, idx, order).collect()[0]
    assert st["total_abs_drift"] > 0 and st["n_new"] >= 0
    assert 0.0 < st["drift_ratio"] < 1.0


def test_order_refresh_amortized(spark, sf_dir, tmp_path):
    """refresh_prefix_order re-freezes the order from the index's own
    df shards and repositions stored rows WITHOUT re-tokenizing; the
    delta join answer is unchanged (any consistent order is exact) and
    the staleness report drops to zero drift afterwards."""
    import os

    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    stored = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    idx, order = str(tmp_path / "idx"), str(tmp_path / "order")
    half = stored.filter(F.col("doc_id") % 2 == 0)
    DD.freeze_prefix_order(half, "doc_id", "text", order)
    DD.append_positioned_index(half, "doc_id", "text", idx, 0, spark, order)
    DD.append_positioned_index(stored.filter(F.col("doc_id") % 2 == 1),
                               "doc_id", "text", idx, 1, spark, order)

    def pairs():
        return sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in
            DD.prefix_join_stable_delta(spark, idx, order, delta,
                                        "doc_id", "text",
                                        threshold=0.5).collect())

    before_pairs = pairs()
    assert DD.prefix_order_staleness(
        spark, idx, order).collect()[0]["total_abs_drift"] > 0

    DD.refresh_prefix_order(spark, idx, order)

    st = DD.prefix_order_staleness(spark, idx, order).collect()[0]
    assert st["total_abs_drift"] == 0 and st["drift_ratio"] == 0.0
    assert pairs() == before_pairs and len(before_pairs) > 0


def test_positioned_index_serves_any_threshold(spark, sf_dir, tmp_path):
    """The positioned index stores EVERY element row with its (n, pos);
    the prefix cut pos <= n - ceil(t*n) + 1 is applied at QUERY time, so
    one ingest serves any threshold — pinned here at a tighter and a
    looser t than anything the ingest knew about."""
    import os

    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    stored = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    idx, order = str(tmp_path / "idx"), str(tmp_path / "order")
    DD.freeze_prefix_order(stored, "doc_id", "text", order)
    DD.append_positioned_index(stored, "doc_id", "text", idx, 0, spark,
                               order)
    for t in (0.3, 0.8):
        got = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in
            DD.prefix_join_stable_delta(spark, idx, order, delta,
                                        "doc_id", "text",
                                        threshold=t).collect())
        full = DD.prefix_filter_pairs(docs, "doc_id", "text", threshold=t)
        want = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in full.collect()
            if r["id_a"] % 3 == 0 or r["id_b"] % 3 == 0)
        assert got == want, t
        assert len(want) > 0


def test_epoch_mismatch_raises_not_silent(spark, sf_dir, tmp_path):
    """A crashed / concurrent order refresh can leave rows and order on
    different epochs; the prefix lemma needs ONE shared order, so the
    delta join must refuse loudly (never a silent recall loss)."""
    import os

    import pytest
    from pyspark.sql import functions as FF

    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text").limit(60))
    stored = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    idx, order = str(tmp_path / "idx"), str(tmp_path / "order")
    DD.freeze_prefix_order(stored, "doc_id", "text", order)
    DD.append_positioned_index(stored, "doc_id", "text", idx, 0, spark,
                               order)
    # simulate the crashed-mid-swap state: order advanced, rows not
    spark.read.parquet(order).withColumn("epoch", FF.lit(7)) \
        .write.mode("overwrite").parquet(order + ".new")
    import shutil
    shutil.rmtree(order)
    os.replace(order + ".new", order)
    spark.catalog.refreshByPath(order)  # os-level swap: drop listings
    with pytest.raises(ValueError, match="epoch mismatch"):
        DD.prefix_join_stable_delta(spark, idx, order, delta,
                                    "doc_id", "text", threshold=0.5)
    # refresh heals: repositions every batch under the new order
    DD.refresh_prefix_order(spark, idx, order)
    out = DD.prefix_join_stable_delta(spark, idx, order, delta,
                                      "doc_id", "text", threshold=0.5)
    out.count()  # runs clean


def test_incremental_refresh_skips_unchanged_batches(spark, sf_dir, tmp_path):
    """Incremental order refresh (r9): a batch whose repositioned rows
    are byte-identical under the new order is NOT rewritten — it is
    validated in the epoch manifest and the delta join accepts it at
    the new epoch. A no-drift refresh therefore writes nothing; a
    drifted refresh rewrites only what changed; a manifest wiped by a
    crash is detected, and re-running the refresh heals it."""
    import shutil

    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    stored = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    idx, order = str(tmp_path / "idx"), str(tmp_path / "order")
    half = stored.filter(F.col("doc_id") % 2 == 0)
    DD.freeze_prefix_order(half, "doc_id", "text", order)
    DD.append_positioned_index(half, "doc_id", "text", idx, 0, spark, order)
    DD.append_positioned_index(stored.filter(F.col("doc_id") % 2 == 1),
                               "doc_id", "text", idx, 1, spark, order)

    def pairs():
        return sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in
            DD.prefix_join_stable_delta(spark, idx, order, delta,
                                        "doc_id", "text",
                                        threshold=0.5).collect())

    before = pairs()

    # drifted refresh: order re-frozen from full dfs — some batches
    # change; whatever is skipped passes the guard via the manifest
    rep1 = DD.refresh_prefix_order(spark, idx, order)
    assert pairs() == before and len(before) > 0

    # immediate second refresh: zero drift -> every batch byte-identical
    # -> nothing rewritten, manifest alone carries the new epoch
    rep2 = DD.refresh_prefix_order(spark, idx, order)
    assert rep2["rewritten"] == [] and len(rep2["skipped"]) == 2
    assert rep2["epoch"] == rep1["epoch"] + 1
    assert pairs() == before  # accepted purely via manifest validation

    # crash-sim: manifest lost after an all-skipped refresh -> rows
    # carry an old epoch and nothing validates them -> loud refusal;
    # re-running the refresh heals
    os.remove(os.path.join(idx, "rows_epochs.json"))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="epoch mismatch"):
        pairs()
    DD.refresh_prefix_order(spark, idx, order)
    assert pairs() == before


def test_crashed_incremental_refresh_is_refused(spark, sf_dir, tmp_path):
    """r9 review finding #1: a refresh that rewrote a batch under the
    NEW order and crashed BEFORE the order swap must not be vouched by
    the pre-refresh manifest. Both defenses are exercised: the state
    with rows newer than the manifest is refused by the guard, and
    re-running the refresh heals it."""
    import json as _json

    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text").limit(120))
    stored = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    idx, order = str(tmp_path / "idx"), str(tmp_path / "order")
    DD.freeze_prefix_order(stored, "doc_id", "text", order)
    DD.append_positioned_index(stored, "doc_id", "text", idx, 0, spark, order)
    rep = DD.refresh_prefix_order(spark, idx, order)  # manifest at epoch E

    # simulate the crash window: batch 0's rows advance to epoch E+1
    # (as a mid-refresh swap would), order and manifest stay at E
    rows0 = os.path.join(idx, "rows", "batch=0")
    bumped = spark.read.parquet(rows0).withColumn(
        "epoch", F.lit(rep["epoch"] + 1))
    tmp = rows0 + ".bump"
    bumped.write.mode("overwrite").parquet(tmp)
    import shutil
    shutil.rmtree(rows0)
    os.replace(tmp, rows0)
    spark.catalog.refreshByPath(os.path.join(idx, "rows"))
    man = _json.loads(open(os.path.join(idx, "rows_epochs.json")).read())
    # stale manifest really does still match the order epoch; only the
    # exact-rows-epoch check (r10, was `<=`) can catch the bumped rows
    assert man["0"][1] == rep["epoch"] and man["0"][0] <= rep["epoch"]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="epoch mismatch"):
        DD.prefix_join_stable_delta(spark, idx, order, delta,
                                    "doc_id", "text", threshold=0.5)
    DD.refresh_prefix_order(spark, idx, order)  # heals
    out = DD.prefix_join_stable_delta(spark, idx, order, delta,
                                      "doc_id", "text", threshold=0.5)
    out.count()


def test_stale_order_replay_after_refresh_is_refused(spark, sf_dir,
                                                     tmp_path):
    """r9 advisor: an at-least-once ingest replay that positioned its
    rows under a PRE-refresh order but overwrote its batch directory
    AFTER the refresh's manifest landed carries an OLDER epoch than the
    manifest recorded. The former `hi <= manifest` guard vouched those
    rows (silent recall loss — old-order positions under the new
    order); the exact-epoch guard must refuse, and re-running the
    refresh must heal."""
    import shutil

    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text").limit(120))
    stored = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    idx, order = str(tmp_path / "idx"), str(tmp_path / "order")
    DD.freeze_prefix_order(stored, "doc_id", "text", order)
    DD.append_positioned_index(stored, "doc_id", "text", idx, 0, spark, order)
    DD.refresh_prefix_order(spark, idx, order)
    rep = DD.refresh_prefix_order(spark, idx, order)  # zero drift
    assert rep["rewritten"] == []  # manifest alone vouches batch 0

    # replay simulation: batch 0 overwritten with rows positioned under
    # an older order — older epoch AND perturbed positions
    rows0 = os.path.join(idx, "rows", "batch=0")
    man = DD._load_epoch_manifest(idx)
    stale_epoch = man[0][0] - 1
    stale = (spark.read.parquet(rows0)
             .withColumn("epoch", F.lit(stale_epoch))
             .withColumn("pos", F.col("n") - F.col("pos") + 1))
    tmp = rows0 + ".replay"
    stale.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(rows0)
    os.replace(tmp, rows0)
    spark.catalog.refreshByPath(os.path.join(idx, "rows"))

    import pytest as _pytest
    with _pytest.raises(ValueError, match="epoch mismatch"):
        DD.prefix_join_stable_delta(spark, idx, order, delta,
                                    "doc_id", "text", threshold=0.5)
    DD.refresh_prefix_order(spark, idx, order)  # heals (rewrites batch 0)
    DD.prefix_join_stable_delta(spark, idx, order, delta,
                                "doc_id", "text", threshold=0.5).count()

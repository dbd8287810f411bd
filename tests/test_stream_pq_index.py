"""Streaming maintenance of the persisted PQ index: the codebook is
FROZEN at build (retraining per batch would re-key every stored code);
new vectors encode against it and append. Codes are a pure function of
(vector, codebook), so at-least-once replay appends byte-identical rows
the (id, j) dedupe on read collapses — the standing index convention."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.ext import pq as PQ
from activedata_etl_spark.streaming import stream as ST


def _emb(spark, sf_dir, n=200):
    return (spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            .filter(F.col("vec_id") < n).select("vec_id", "embedding"))


def _topk(spark, path, queries):
    return sorted((r.q_id, r.vec_id, r.adc) for r in PQ.pq_index_topk(
        queries, "vec_id", "embedding", spark, path, k=3).collect())


def test_stream_pq_appends_and_replay_idempotence(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "idx")
    PQ.build_pq_index(old, "vec_id", "embedding", idx, m=4, ksub=8,
                      n_iter=2, dim=64)

    inbox = str(tmp_path / "inbox")
    new.write.parquet(inbox)

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        PQ.append_pq_codes(batch_df, "vec_id", "embedding", spark, idx)

    ST.run_foreach_batch(ST.file_stream(spark, inbox, emb.schema),
                         ingest, str(tmp_path / "ckpt")).awaitTermination(120)

    qs = emb.filter(F.col("vec_id") < 10)
    got = _topk(spark, idx, qs)

    # index-served == direct ADC with the SAME (frozen) codebook over
    # the full corpus: encode everything against the build codebook
    cb = PQ.read_pq_codebook(spark, idx)
    codes = PQ.pq_encode(emb, "vec_id", "embedding", cb, m=4, dim=64)
    want = sorted((r.q_id, r.vec_id, r.adc) for r in PQ._adc_topk(
        codes, cb, qs, "vec_id", "embedding", 3, 4, 64).collect())
    assert got == want and len(got) == 30

    # at-least-once replay: identical rows, dedupe on read, result fixed
    PQ.append_pq_codes(new, "vec_id", "embedding", spark, idx)
    assert _topk(spark, idx, qs) == want


def test_frozen_codebook_differs_from_retrain(spark, sf_dir, tmp_path):
    """The design reason the codebook freezes: retraining on the grown
    corpus yields different codebooks (so different codes for OLD
    vectors) — appending must not silently re-key the index."""
    emb = _emb(spark, sf_dir)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    idx = str(tmp_path / "idx")
    PQ.build_pq_index(old, "vec_id", "embedding", idx, m=4, ksub=8,
                      n_iter=2, dim=64)
    frozen = {(r.j, r.code, tuple(r.cvec)) for r in
              PQ.read_pq_codebook(spark, idx).collect()}
    retrained = {(r.j, r.code, tuple(r.cvec)) for r in PQ.pq_train(
        emb, "vec_id", "embedding", m=4, ksub=8, n_iter=2,
        dim=64).collect()}
    assert frozen != retrained


def test_purge_pq_codes_right_to_be_forgotten(spark, sf_dir, tmp_path):
    """After a purge, no ADC answer may mention a forgotten id, and the
    surviving answers equal an index built without the victims (same
    frozen codebook — purge does not retrain)."""
    emb = _emb(spark, sf_dir)
    idx = str(tmp_path / "idx")
    PQ.build_pq_index(emb, "vec_id", "embedding", idx, m=4, ksub=8,
                      n_iter=2, dim=64)
    victims = [r.vec_id for r in
               emb.filter(F.col("vec_id") % 9 == 5)
               .select("vec_id").collect()][:10]
    assert PQ.purge_pq_codes(spark, idx, victims) == 1
    qs = emb.filter(F.col("vec_id") < 10)
    got = PQ.pq_index_topk(qs, "vec_id", "embedding", spark, idx, k=3)
    rows = got.collect()
    assert rows and not any(r.vec_id in set(victims) for r in rows)
    # equality with a manual filter of the codes under the same codebook
    cb = PQ.read_pq_codebook(spark, idx)
    codes = PQ.read_pq_codes(spark, idx)
    want = sorted((r.q_id, r.vec_id, r.adc) for r in PQ._adc_topk(
        codes, cb, qs, "vec_id", "embedding", 3, 4, 64).collect())
    assert sorted((r.q_id, r.vec_id, r.adc) for r in rows) == want
    # idempotent: purging the same ids again is a no-op
    assert PQ.purge_pq_codes(spark, idx, victims) == 0


def test_ahash_group_index_equals_row_index(spark, sf_dir, tmp_path):
    """The GROUP-layout perceptual index must serve exactly the pairs
    the row-layout index serves (delta-touching hamming-ball), with
    appends and replayed appends collapsing on read."""
    import os as _os

    from activedata_etl_spark.ext import multimodal as MM

    docs = (spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
            .filter(F.col("doc_id") < 400).select("doc_id", "text"))
    hist1 = docs.filter(F.col("doc_id") % 10 < 5)
    hist2 = docs.filter((F.col("doc_id") % 10 >= 5)
                        & (F.col("doc_id") % 10 < 7))
    delta = docs.filter(F.col("doc_id") % 10 >= 7)

    row_idx = str(tmp_path / "row")
    MM.build_ahash_index(hist1, "doc_id", "text", row_idx)
    MM.append_ahash_index(hist2, "doc_id", "text", row_idx)
    grp_idx = str(tmp_path / "grp")
    MM.build_ahash_group_index(hist1, "doc_id", "text", grp_idx)
    MM.append_ahash_group_index(hist2, "doc_id", "text", grp_idx)
    # replayed append: byte-identical fragments, collapsed on read
    MM.append_ahash_group_index(hist2, "doc_id", "text", grp_idx)

    want = {(r.id_a, r.id_b, r.hamming) for r in
            MM.ahash_pairs_against_index(delta, "doc_id", "text", spark,
                                         row_idx, max_hamming=6).collect()}
    got = {(r.id_a, r.id_b, r.hamming) for r in
           MM.ahash_group_index_pairs(delta, "doc_id", "text", spark,
                                      grp_idx, max_hamming=6).collect()}
    assert got == want and len(got) > 0


def test_ivfpq_index_partition_prunes_and_appends(spark, sf_dir, tmp_path):
    """The persisted IVF-PQ index reads ONLY probed cid directories (a
    partition filter on the codes scan), appends route+encode against
    the frozen models, and a replayed append collapses on read."""
    emb = _emb(spark, sf_dir)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "idx")
    PQ.build_ivfpq_index(old, "vec_id", "embedding", idx, nlist=8,
                         m=4, ksub=8, n_iter=2, dim=64)
    PQ.append_ivfpq_index(new, "vec_id", "embedding", spark, idx)
    qs = emb.filter(F.col("vec_id") < 6)
    out = PQ.ivfpq_index_topk(qs, "vec_id", "embedding", spark, idx,
                              k=3, nprobe=2)
    # plan: the codes scan carries a cid PartitionFilter (the probed
    # set), so unprobed clusters' directories are never opened — assert
    # on the stored read directly (the query plan hides behind its
    # localCheckpoint, the dedup_index test precedent)
    import os as _os
    codes = spark.read.parquet(_os.path.join(idx, "codes"))
    plan = (codes.filter(F.col("cid").isin([0, 1]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan
    assert "cid" in plan.split("PartitionFilters", 1)[1][:300]

    rows = {(r.q_id, r.vec_id, r.adc) for r in out.collect()}
    assert rows and len({q for q, _, _ in rows}) == 6

    # equality with the manual frozen-model pipeline over the union
    cent = spark.read.parquet(_os.path.join(idx, "centroids"))
    cb = PQ.read_pq_codebook(spark, idx)
    assign = PQ._route(emb, cent, "vec_id", "embedding", nprobe=1) \
        .withColumnRenamed("q_id", "id")
    codes_all = PQ.pq_encode(emb, "vec_id", "embedding", cb, 4, 64)
    probes = PQ._route(qs, cent, "vec_id", "embedding", nprobe=2)
    cand = (assign.join(probes, assign["cid"] == probes["cid"])
            .filter(F.col("q_id") != F.col("id"))
            .select("q_id", "id"))
    want = {(r.q_id, r.vec_id, r.adc) for r in PQ._adc_topk(
        codes_all, cb, qs, "vec_id", "embedding", 3, 4, 64,
        cand=cand).collect()}
    assert rows == want

    # replayed append: dedupe on read keeps the answer fixed
    PQ.append_ivfpq_index(new, "vec_id", "embedding", spark, idx)
    rows2 = {(r.q_id, r.vec_id, r.adc) for r in PQ.ivfpq_index_topk(
        qs, "vec_id", "embedding", spark, idx, k=3, nprobe=2).collect()}
    assert rows2 == rows


def test_purge_ivfpq_preserves_partitioned_layout(spark, sf_dir, tmp_path):
    """The r10-ADVICE misuse: purging an IVF-PQ index through the flat
    rewrite demoted cid to a data column, so the next partitioned
    append produced a layout partition discovery rejects (and pruning
    was lost even before that). Purge is now layout-aware and
    seek-shaped: only cid directories holding forgotten ids rewrite,
    untouched cluster files stay byte-identical, appends keep working,
    and no answer mentions a forgotten id."""
    import os as _os

    emb = _emb(spark, sf_dir)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "idx")
    PQ.build_ivfpq_index(old, "vec_id", "embedding", idx, nlist=8,
                         m=4, ksub=8, n_iter=2, dim=64)
    codes_dir = _os.path.join(idx, "codes")

    def _leaf_bytes():
        out = {}
        for d in sorted(_os.listdir(codes_dir)):
            if not d.startswith("cid="):
                continue
            leaf = _os.path.join(codes_dir, d)
            out[d] = {f: _os.path.getsize(_os.path.join(leaf, f))
                      for f in sorted(_os.listdir(leaf))
                      if f.endswith(".parquet")}
        return out

    before = _leaf_bytes()
    victims = [r.vec_id for r in
               old.filter(F.col("vec_id") % 10 == 4)
               .select("vec_id").collect()][:8]
    hit_cids = {r.cid for r in
                spark.read.parquet(codes_dir)
                .filter(F.col("id").isin(victims))
                .select("cid").distinct().collect()}
    n = PQ.purge_ivfpq_codes(spark, idx, victims)
    assert n == len(hit_cids) > 0
    after = _leaf_bytes()
    # layout intact: still cid= directories, and untouched clusters'
    # files are byte-identical (seek-shaped — only hit dirs rewrote)
    assert set(after) <= set(before)
    for d, files in before.items():
        if int(d.split("=", 1)[1]) not in hit_cids:
            assert after[d] == files
    # replayed purge: true no-op
    assert PQ.purge_ivfpq_codes(spark, idx, victims) == 0

    # the append the flat rewrite used to poison
    PQ.append_ivfpq_index(new, "vec_id", "embedding", spark, idx)
    qs = emb.filter(F.col("vec_id") < 6)
    rows = PQ.ivfpq_index_topk(qs, "vec_id", "embedding", spark, idx,
                               k=3, nprobe=2).collect()
    assert rows and not any(r.vec_id in set(victims) for r in rows)
    # pruning still works: the codes scan keeps its partition column
    plan = (spark.read.parquet(codes_dir)
            .filter(F.col("cid").isin([0, 1]))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan
    assert "cid" in plan.split("PartitionFilters", 1)[1][:300]
    # and a flat PQ index refuses the ivfpq entry point
    flat = str(tmp_path / "flat")
    PQ.build_pq_index(old, "vec_id", "embedding", flat, m=4, ksub=8,
                      n_iter=2, dim=64)
    import pytest
    with pytest.raises(AssertionError, match="flat PQ index"):
        PQ.purge_ivfpq_codes(spark, flat, victims)


def test_balanced_index_freezes_permutation(spark, sf_dir, tmp_path):
    """A balance_dims index freezes the variance permutation in its
    meta (the frozen-model convention the codebook follows): serving
    equals the inline balanced chain, and appended vectors encode under
    the SAME stored permutation — an append that recomputed it on the
    grown corpus would silently re-key every stored code, exactly the
    retrain hazard the frozen codebook exists to prevent."""
    import json as _json
    import os as _os

    emb = _emb(spark, sf_dir)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "idx")
    PQ.build_pq_index(old, "vec_id", "embedding", idx, m=4, ksub=8,
                      n_iter=2, dim=64, balance_dims=True)
    with open(_os.path.join(idx, "_pq_meta.json")) as f:
        meta = _json.load(f)
    perm = meta["perm"]
    assert sorted(perm) == list(range(64))
    assert perm == PQ.dim_permutation(old, "vec_id", "embedding", 4, 64)

    qs = emb.filter(F.col("vec_id") < 10)
    got = sorted((r.q_id, r.vec_id, r.adc) for r in PQ.pq_index_topk(
        qs, "vec_id", "embedding", spark, idx, k=3).collect())
    cb = PQ.read_pq_codebook(spark, idx)
    want = sorted((r.q_id, r.vec_id, r.adc) for r in PQ._adc_topk(
        PQ.read_pq_codes(spark, idx), cb, qs, "vec_id", "embedding",
        3, 4, 64, perm=perm).collect())
    assert got == want and len(got) == 30

    # append under the FROZEN perm: stored codes for the new batch
    # equal an explicit encode-with-perm, and replay collapses
    PQ.append_pq_codes(new, "vec_id", "embedding", spark, idx)
    stored = {(r.id, r.j, r.code) for r in
              PQ.read_pq_codes(spark, idx).collect()}
    expect_new = {(r.id, r.j, r.code) for r in PQ.pq_encode(
        new, "vec_id", "embedding", cb, 4, 64, perm=perm).collect()}
    assert expect_new <= stored
    before = sorted((r.q_id, r.vec_id, r.adc) for r in PQ.pq_index_topk(
        qs, "vec_id", "embedding", spark, idx, k=3).collect())
    PQ.append_pq_codes(new, "vec_id", "embedding", spark, idx)
    after = sorted((r.q_id, r.vec_id, r.adc) for r in PQ.pq_index_topk(
        qs, "vec_id", "embedding", spark, idx, k=3).collect())
    assert before == after

    # ivfpq variant: balanced build serves and purges with pruning intact
    ividx = str(tmp_path / "ividx")
    PQ.build_ivfpq_index(old, "vec_id", "embedding", ividx, nlist=8,
                         m=4, ksub=8, n_iter=2, dim=64,
                         balance_dims=True)
    rows = PQ.ivfpq_index_topk(qs, "vec_id", "embedding", spark, ividx,
                               k=3, nprobe=2).collect()
    assert len(rows) == 30
    victims = [r.vec_id for r in old.limit(5).collect()]
    assert PQ.purge_ivfpq_codes(spark, ividx, victims) > 0
    rows2 = PQ.ivfpq_index_topk(qs, "vec_id", "embedding", spark, ividx,
                                k=3, nprobe=2).collect()
    assert rows2 and not any(r.vec_id in set(victims) for r in rows2)


def test_rotated_index_streaming_appends(spark, sf_dir, tmp_path):
    """A trained rotation frozen into the index meta (r12 full-OPQ)
    must govern STREAMING appends exactly like the permutation:
    batches encode through the frozen (rot, perm, codebook), replay
    stays idempotent, and index-served top-k equals the direct chain
    with the same frozen model over the full corpus."""
    emb = _emb(spark, sf_dir)
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "idx")
    PQ.build_pq_index(old, "vec_id", "embedding", idx, m=4, ksub=8,
                      n_iter=2, dim=64, balance_dims=True, rotation="pca")
    import json
    meta = json.load(open(os.path.join(idx, "_pq_meta.json")))
    assert meta["rot"] is not None and meta["perm"] is not None

    inbox = str(tmp_path / "inbox")
    new.write.parquet(inbox)

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        PQ.append_pq_codes(batch_df, "vec_id", "embedding", spark, idx)

    ST.run_foreach_batch(ST.file_stream(spark, inbox, emb.schema),
                         ingest, str(tmp_path / "ckpt")).awaitTermination(120)

    qs = emb.filter(F.col("vec_id") < 10)
    got = _topk(spark, idx, qs)
    cb = PQ.read_pq_codebook(spark, idx)
    codes = PQ.pq_encode(emb, "vec_id", "embedding", cb, m=4, dim=64,
                         perm=meta["perm"], rot=meta["rot"])
    want = sorted((r.q_id, r.vec_id, r.adc) for r in PQ._adc_topk(
        codes, cb, qs, "vec_id", "embedding", 3, 4, 64,
        perm=meta["perm"], rot=meta["rot"]).collect())
    assert got == want and len(got) == 30
    # replay idempotence under the rotated chain
    PQ.append_pq_codes(new, "vec_id", "embedding", spark, idx)
    assert _topk(spark, idx, qs) == want

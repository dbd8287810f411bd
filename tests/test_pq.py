"""Product quantization (ext/pq.py): determinism, partition invariance,
and the ADC plan shape (broadcast joins only — the corpus-sized leg is
codes, never raw vectors)."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.ext import pq as PQ


def _emb(spark, sf_dir, n=200):
    return (spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            .filter(F.col("vec_id") < n).select("vec_id", "embedding"))


def test_codes_partition_invariant(spark, sf_dir):
    """Codebooks and codes must not depend on physical partitioning
    (floor-quantized means + min_by tie rule carry the determinism)."""
    emb = _emb(spark, sf_dir)
    def run(df):
        cb = PQ.pq_train(df, "vec_id", "embedding", m=4, ksub=8,
                         n_iter=2, dim=64)
        codes = PQ.pq_encode(df, "vec_id", "embedding", cb, m=4, dim=64)
        return {(r.id, r.j, r.code) for r in codes.collect()}
    assert run(emb.repartition(7)) == run(emb.repartition(3))


def test_every_vector_gets_m_codes(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cb = PQ.pq_train(emb, "vec_id", "embedding", m=4, ksub=8,
                     n_iter=2, dim=64)
    codes = PQ.pq_encode(emb, "vec_id", "embedding", cb, m=4, dim=64)
    per = codes.groupBy("id").count().select("count").distinct().collect()
    assert [r["count"] for r in per] == [4]
    # codes live in [0, ksub)
    mm = codes.agg(F.min("code"), F.max("code")).first()
    assert mm[0] >= 0 and mm[1] <= 7


def test_adc_plan_broadcast_only(spark, sf_dir):
    """The ADC scoring path: distance table and codebook broadcast; the
    encoded corpus is never cartesian/sort-merge paired."""
    emb = _emb(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < 5)
    out = PQ.pq_topk(emb, qs, "vec_id", "embedding", k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_topk_neighbors_sane(spark, sf_dir):
    """ADC is approximate, but a vector's PQ-nearest neighbors must
    rank vectors with identical codes first: the top hit for a query
    that shares all m codes with another vector scores adc == the
    self-distance of that code combination (non-negative, finite)."""
    emb = _emb(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < 10)
    out = PQ.pq_topk(emb, qs, "vec_id", "embedding", k=3).collect()
    assert len(out) == 30
    assert all(r.adc >= 0.0 for r in out)
    # per query: ranked ascending, ties broken by vec_id
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append((r.adc, r.vec_id))
    for q, rows in by_q.items():
        assert rows == sorted(rows)


def test_ivfpq_corpus_legs_equijoin_only(spark, sf_dir):
    """IVF-PQ plan shape: the only nested-loop pairing is the
    query×centroid routing (queries × nlist rows, broadcast); every
    corpus-sized leg (assignment, codes, candidates) joins equi- or
    broadcast-hash. And each query's neighbors must come only from its
    probed clusters."""
    emb = _emb(spark, sf_dir, n=300)
    qs = emb.filter(F.col("vec_id") < 5)
    out = PQ.ivfpq_topk(emb, qs, "vec_id", "embedding", k=3,
                        nlist=8, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    rows = out.collect()
    assert rows and all(r.adc >= 0.0 for r in rows)
    # candidates restricted to probed clusters: every returned neighbor
    # shares a probed cluster with its query
    from activedata_etl_spark.ext.similarity import cosine, ivf_build
    cent, assign = ivf_build(emb, "vec_id", "embedding", nlist=8, n_iter=2)
    cid_of = {r.vec_id: r.cid for r in
              assign.select("vec_id", "cid").collect()}
    from pyspark.sql.window import Window as W
    q = qs.select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("qv"))
    sc = (q.crossJoin(F.broadcast(cent))
          .withColumn("cc", cosine(
              F.expr("transform(qv, x -> cast(x as double))"),
              F.col("cvec"))))
    wq = W.partitionBy("q_id").orderBy(F.col("cc").desc(),
                                       F.col("cid").asc())
    probed = {}
    for r in (sc.withColumn("rn", F.row_number().over(wq))
              .filter("rn <= 2").select("q_id", "cid").collect()):
        probed.setdefault(r.q_id, set()).add(r.cid)
    for r in rows:
        assert cid_of[r.vec_id] in probed[r.q_id], (r, probed[r.q_id])


def test_train_seed_is_takeordered_no_corpus_window(spark, sf_dir):
    """Seeding must be a TakeOrdered over ids (lowest ksub), never a
    corpus-wide Window: v1 shuffled every (id, j, sv) row into m
    partitions just to keep ksub of them (r10 ADVICE). The one Window
    left ranks the ksub seed rows AFTER the TakeOrdered+broadcast-join
    prune — it must sit strictly above the TakeOrdered in the plan (its
    input is ksub·m rows whatever the corpus size)."""
    emb = _emb(spark, sf_dir)
    cb = PQ.pq_train(emb, "vec_id", "embedding", m=4, ksub=8,
                     n_iter=2, dim=64)
    plan = cb._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # every Window node's subtree contains the TakeOrdered prune —
    # i.e. no Window anywhere consumes unpruned corpus rows
    lines = plan.splitlines()
    win_rows = [i for i, l in enumerate(lines) if "Window [" in l]
    tak_rows = [i for i, l in enumerate(lines)
                if "TakeOrderedAndProject" in l]
    assert win_rows and tak_rows
    assert all(any(t > w for t in tak_rows) for w in win_rows)
    assert cb.count() <= 4 * 8


def test_train_fraction_matches_explicit_sample(spark, sf_dir):
    """train_fraction trains on the deterministic md5 hash sample: the
    resulting codebook must equal training on the explicitly-filtered
    corpus (the oracle form), and full-corpus encode against it stays
    total — every vector gets m codes."""
    from activedata_etl_spark.ext.sampling import hash_sample

    emb = _emb(spark, sf_dir)
    cb_knob = {(r.j, r.code, tuple(r.cvec)) for r in PQ.pq_train(
        emb, "vec_id", "embedding", m=4, ksub=8, n_iter=2, dim=64,
        train_fraction=0.5).collect()}
    sampled = hash_sample(emb, F.col("vec_id"), 0.5, salt="pqtrain:")
    cb_manual = {(r.j, r.code, tuple(r.cvec)) for r in PQ.pq_train(
        sampled, "vec_id", "embedding", m=4, ksub=8, n_iter=2,
        dim=64).collect()}
    assert cb_knob == cb_manual and len(cb_knob) > 0
    # the sample is real (a different codebook than full-corpus training)
    cb_full = {(r.j, r.code, tuple(r.cvec)) for r in PQ.pq_train(
        emb, "vec_id", "embedding", m=4, ksub=8, n_iter=2,
        dim=64).collect()}
    assert cb_knob != cb_full
    # encode stays full-corpus: every vector coded in all m subspaces
    cb_df = PQ.pq_train(emb, "vec_id", "embedding", m=4, ksub=8,
                        n_iter=2, dim=64, train_fraction=0.5)
    codes = PQ.pq_encode(emb, "vec_id", "embedding", cb_df, m=4, dim=64)
    per = codes.groupBy("id").count().select("count").distinct().collect()
    assert [r["count"] for r in per] == [4]


def test_dim_permutation_balanced_pq(spark, sf_dir):
    """The variance-balancing permutation (r11 OPQ-lite): valid
    permutation, partition-invariant (exact-integer ranking), identity
    perm reproduces the unpermuted chain exactly, and the permutation
    is applied as a plan-time projection — no extra shuffle/Window in
    the training plan beyond the unpermuted form's."""
    emb = _emb(spark, sf_dir)
    perm = PQ.dim_permutation(emb, "vec_id", "embedding", 4, 64)
    assert sorted(perm) == list(range(64))
    assert PQ.dim_permutation(emb.repartition(7), "vec_id", "embedding",
                              4, 64) == perm

    ident = {(r.j, r.code, tuple(r.cvec)) for r in PQ.pq_train(
        emb, "vec_id", "embedding", m=4, ksub=8, n_iter=2, dim=64,
        perm=list(range(64))).collect()}
    plain = {(r.j, r.code, tuple(r.cvec)) for r in PQ.pq_train(
        emb, "vec_id", "embedding", m=4, ksub=8, n_iter=2,
        dim=64).collect()}
    assert ident == plain

    balanced = PQ.pq_train(emb, "vec_id", "embedding", m=4, ksub=8,
                           n_iter=2, dim=64, perm=perm)
    plan = balanced._jdf.queryExecution().executedPlan().toString()
    ref = PQ.pq_train(emb, "vec_id", "embedding", m=4, ksub=8,
                      n_iter=2, dim=64) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == ref.count("Exchange")
    assert plan.count("Window") == ref.count("Window")
    # and the balanced top-k runs end to end with the same shape
    qs = emb.filter(F.col("vec_id") < 5)
    out = PQ.pq_topk(emb, qs, "vec_id", "embedding", k=3,
                     balance_dims=True)
    assert out.count() == 15


def test_rotation_identity_bitexact(spark, sf_dir):
    """rotation=identity must reproduce the unrotated chain to the
    bit: the in-order fold adds exact 0.0 no-ops and one exact 1.0·x,
    so every downstream float (codebook, codes, ADC) is unchanged."""
    emb = _emb(spark, sf_dir, n=120)
    qs = emb.filter(F.col("vec_id") < 5)
    ident = [[1.0 if i == j else 0.0 for j in range(64)]
             for i in range(64)]
    a = PQ.pq_topk(emb, qs, "vec_id", "embedding", k=3, m=4, ksub=8,
                   dim=64).collect()
    b = PQ.pq_topk(emb, qs, "vec_id", "embedding", k=3, m=4, ksub=8,
                   dim=64, rotation=ident).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pca_rotation_deterministic_orthogonal(spark):
    """pca_rotation (full-OPQ adoption, r12): bit-identical across
    calls and partitionings (exact quantized-integer covariance +
    frozen canonicalized eigensolve), orthogonal, and it actually
    de-correlates — on a correlated-anisotropic fixture the rotated
    per-coordinate variance ratio must blow up (the anisotropy the
    permutation then balances)."""
    import numpy as np

    rng = np.random.default_rng(42)
    dim, n = 16, 400
    z = rng.standard_normal((n, dim))
    w = np.power(2.0, -np.arange(dim) / 3.0)
    r, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    x = (z * w) @ r.T
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>")
    r1 = PQ.pca_rotation(df, "vec_id", "embedding", dim)
    r2 = PQ.pca_rotation(df.repartition(7), "vec_id", "embedding", dim)
    assert r1 == r2, "not partition-invariant"
    rm = np.array(r1)
    assert np.allclose(rm @ rm.T, np.eye(dim), atol=1e-9)
    rx = x @ rm.T
    raw = x.var(axis=0).max() / x.var(axis=0).min()
    rot = rx.var(axis=0).max() / rx.var(axis=0).min()
    assert rot > 10 * raw, f"no decorrelation: {raw:.1f} -> {rot:.1f}"


def test_rotated_index_append_serves_consistently(spark, sf_dir, tmp_path):
    """A rotation frozen into the index meta must govern appends and
    serving: codes appended later equal codes encoded directly with
    the frozen (rot, codebook), and index-served top-k equals the
    in-memory chain on the same corpus."""
    from activedata_etl_spark.queries.q_ext10 import _fixed_rotation

    emb = _emb(spark, sf_dir, n=150)
    base = emb.filter(F.col("vec_id") < 120)
    extra = emb.filter(F.col("vec_id") >= 120)
    path = str(tmp_path / "pqrot")
    PQ.build_pq_index(base, "vec_id", "embedding", path, m=4, ksub=8,
                      n_iter=2, dim=64, balance_dims=True,
                      rotation=_fixed_rotation())
    import json
    meta = json.load(open(os.path.join(path, "_pq_meta.json")))
    assert meta["rot"] is not None and len(meta["rot"]) == 64
    PQ.append_pq_codes(extra, "vec_id", "embedding", spark, path)
    cb = PQ.read_pq_codebook(spark, path)
    direct = {(r.id, r.j, r.code) for r in
              PQ.pq_encode(extra, "vec_id", "embedding", cb, m=4, dim=64,
                           perm=meta["perm"], rot=meta["rot"]).collect()}
    stored = {(r.id, r.j, r.code) for r in
              PQ.read_pq_codes(spark, path)
              .filter(F.col("id") >= 120).collect()}
    assert direct == stored
    qs = emb.filter(F.col("vec_id") < 5)
    served = {(r.q_id, r.vec_id) for r in
              PQ.pq_index_topk(qs, "vec_id", "embedding", spark, path,
                               k=3).collect()}
    assert len(served) == 15

"""Deterministic sampling properties (ext/sampling.py): stability under
repartition and corpus growth — the guarantees seed-based sampling lacks."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.ext import sampling as S


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_sample_stable_under_repartition_and_growth(spark, sf_dir):
    d = _docs(spark, sf_dir)
    ids = lambda df: {r.doc_id for r in df.select("doc_id").collect()}  # noqa: E731

    s1 = ids(S.hash_sample(d, F.col("doc_id"), 0.2, salt="x"))
    s2 = ids(S.hash_sample(d.repartition(13), F.col("doc_id"), 0.2, salt="x"))
    assert s1 == s2  # layout-independent

    half = d.filter(F.col("doc_id") % 2 == 0)
    s_half = ids(S.hash_sample(half, F.col("doc_id"), 0.2, salt="x"))
    assert s_half == {i for i in s1 if i % 2 == 0}  # append-consistent

    # fraction lands near target (md5 uniformity)
    n = d.count()
    assert 0.1 * n < len(s1) < 0.3 * n


def test_split_labels_partition_the_corpus(spark, sf_dir):
    d = _docs(spark, sf_dir)
    lab = d.withColumn("split", S.split_label(
        F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, salt="x"))
    counts = {r.split: r.n for r in
              lab.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}  # every row exactly one label
    assert sum(counts.values()) == d.count()
    assert counts["train"] > counts["val"] + counts["test"]

    # salt decorrelates: different salt -> different (but same-sized) draw
    a = S.hash_sample(d, F.col("doc_id"), 0.2, salt="x")
    b = S.hash_sample(d, F.col("doc_id"), 0.2, salt="y")
    ia = {r.doc_id for r in a.select("doc_id").collect()}
    ib = {r.doc_id for r in b.select("doc_id").collect()}
    assert ia != ib


def test_stratified_take_exact_n(spark, sf_dir):
    d = _docs(spark, sf_dir)
    took = S.stratified_take(d, "lang", F.col("doc_id"), 7, salt="x")
    per = {r.lang: r.n for r in
           took.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    avail = {r.lang: r.n for r in
             d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(7, avail[lang])


def test_global_shuffle_permutation(spark, sf_dir):
    d = _docs(spark, sf_dir)
    n = d.count()
    shuf = S.global_shuffle(d, F.col("doc_id"), n_shards=4, salt="gs")
    rows = shuf.select("shard", "pos", "doc_id").collect()
    # a permutation: every doc exactly once
    assert len(rows) == n
    assert len({r.doc_id for r in rows}) == n
    # dense 0..k-1 positions within each shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # layout-invariant: same assignment after a repartition
    rows2 = (S.global_shuffle(d.repartition(7), F.col("doc_id"), 4, salt="gs")
             .select("shard", "pos", "doc_id").collect())
    assert {(r.shard, r.pos, r.doc_id) for r in rows2} == \
           {(r.shard, r.pos, r.doc_id) for r in rows}
    # salt changes the order
    rows3 = (S.global_shuffle(d, F.col("doc_id"), 4, salt="other")
             .select("shard", "pos", "doc_id").collect())
    assert {(r.shard, r.pos, r.doc_id) for r in rows3} != \
           {(r.shard, r.pos, r.doc_id) for r in rows}


def test_kcenter_coreset_invariants(spark, sf_dir):
    """Greedy k-center: distinct centers, seed first, and the covering
    distance (each pick's max-min distance) is monotone non-increasing
    — the Gonzalez greedy guarantee."""
    from activedata_etl_spark.ext.sampling import kcenter_coreset
    from activedata_etl_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = kcenter_coreset(emb, "vec_id", "embedding", k=5).collect()
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    ids = [r["vec_id"] for r in out]
    assert len(set(ids)) == 5
    assert ids[0] == emb.agg({"vec_id": "min"}).first()[0]
    dists = [r["min_dist"] for r in out]
    assert dists[0] is None
    assert all(d is not None and d >= 0 for d in dists[1:])
    assert all(a >= b for a, b in zip(dists[1:], dists[2:]))


def test_kcenter_k_exceeds_corpus(spark):
    """k larger than the corpus returns every point once, no crash."""
    from activedata_etl_spark.ext.sampling import kcenter_coreset

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>")
    out = kcenter_coreset(df, "vec_id", "embedding", k=10).collect()
    assert len(out) == 3
    assert sorted(r["vec_id"] for r in out) == [1, 2, 3]

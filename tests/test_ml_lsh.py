"""spark.ml LSH alternates: recall sanity vs the exact operators."""

import pytest
from pyspark.sql import functions as F

from activedata_etl_spark.ext import ml_lsh
from activedata_etl_spark.ext import text as TX
from activedata_etl_spark.io import load_table

pytestmark = pytest.mark.skipif(not ml_lsh.ML_AVAILABLE, reason="pyspark.ml missing")


def test_minhash_lsh_finds_exact_dups(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(100)
    # plant an exact duplicate pair
    dup = d.limit(1).select((F.col("doc_id") + 100000).alias("doc_id"), "text",
                            "lang", "source", "n_chars")
    corpus = d.unionByName(dup)
    pairs = ml_lsh.minhash_lsh_pairs(
        corpus, "doc_id", TX.tokens("text"), max_jaccard_distance=0.2)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    orig = d.limit(1).first()["doc_id"]
    assert (orig, orig + 100000) in found


def test_random_projection_self_neighbors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    pairs = ml_lsh.random_projection_neighbors(
        emb, "vec_id", "embedding", max_l2_distance=100.0)
    # neighbors exist and distances are non-negative
    rows = pairs.limit(10).collect()
    assert rows and all(r["l2_dist"] >= 0 for r in rows)


def test_auto_sign_bits_scale_with_corpus(spark, sf_dir):
    """The sf1-adjudicated knob: sign-LSH width grows ~log2 with the
    candidate count, so bucket occupancy (and the candidate join
    volume) stays bounded as the corpus grows."""
    import math

    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import similarity as SIM
    from activedata_etl_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    b1 = SIM.auto_sign_bits(emb, "embedding", target_bucket=64)
    assert b1 == max(4, math.ceil(math.log2(max(2.0, n / 64))))
    big = emb
    for i in range(1, 10):
        big = big.unionByName(emb.select(
            (F.col("vec_id") + 100000 * i).alias("vec_id"),
            "embedding", "label"))
    b10 = SIM.auto_sign_bits(big, "embedding", target_bucket=64)
    # 10x corpus -> +ceil(log2(10)) more bits (3 or 4 by rounding)
    assert b10 - b1 in (3, 4)
    # and the auto path plugs straight into the ANN entry points
    q = emb.limit(5).select(F.col("vec_id").alias("q_id"),
                            F.col("embedding").alias("q_vec"))
    out = SIM.ann_multiprobe_topk(q, emb, "q_id", "q_vec",
                                  "vec_id", "embedding", k=3,
                                  n_bits="auto")
    got = out.groupBy("q_id").count().collect()
    assert all(r["count"] <= 3 for r in got) and got


def test_semantic_dedup_auto_nlist(spark, sf_dir):
    """nlist="auto" picks ~sqrt(N) clusters (the SemDeDup contract) so
    cluster size and count both grow as sqrt(N) instead of size x10 at
    fixed k."""
    import math

    from activedata_etl_spark.ext import similarity as SIM
    from activedata_etl_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = SIM.semantic_dedup(emb, "vec_id", "embedding", nlist="auto")
    n = emb.count()
    n_clusters = out.select("cid").distinct().count()
    # every cluster got at least one member; count bounded by sqrt(N)
    assert 2 <= n_clusters <= max(2, int(math.isqrt(n)))
    assert out.count() == n  # one verdict row per vector

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

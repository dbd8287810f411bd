"""spark.ml-backed alternates for the dedup/similarity scale paths.

The hand-rolled operators in ``ext/dedup.py``/``ext/similarity.py`` are
engine-portable (md5-based, oracle-checkable). These wrappers expose the
spark.ml estimators for the same jobs — ``MinHashLSH`` over a token
``CountVectorizer''-style binary vector and ``BucketedRandomProjectionLSH``
over embeddings — as the battle-tested JVM implementations with
``approxSimilarityJoin``'s optimized band joins. Results are approximate
and seed-dependent → never oracle-paired; use where throughput matters
more than reproducibility across engines.

Gated behind import-try: spark.ml needs numpy at import time and is an
optional path for this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

try:
    from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH

    ML_AVAILABLE = True
except Exception:  # pragma: no cover
    ML_AVAILABLE = False


def minhash_lsh_pairs(df: DataFrame, id_col: str, toks, *,
                      num_hash_tables: int = 8, num_features: int = 1 << 18,
                      max_jaccard_distance: float = 0.5,
                      seed: int = 42) -> DataFrame:
    """Near-dup candidate pairs via spark.ml MinHashLSH.

    tokens → HashingTF binary term vector → MinHash → approxSimilarityJoin.
    Distance is (1 - Jaccard); output (id_a, id_b, jaccard_dist).
    """
    if not ML_AVAILABLE:  # pragma: no cover
        raise ImportError("pyspark.ml unavailable")
    tf = HashingTF(inputCol="__toks__", outputCol="__vec__",
                   numFeatures=num_features, binary=True)
    vecs = tf.transform(df.select(F.col(id_col), toks.alias("__toks__")))
    vecs = vecs.filter(F.expr("aggregate(__toks__, 0, (a, x) -> a + 1) > 0"))
    model = MinHashLSH(inputCol="__vec__", outputCol="__hashes__",
                       numHashTables=num_hash_tables, seed=seed).fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, max_jaccard_distance,
                                       distCol="jaccard_dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            "jaccard_dist",
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


def random_projection_neighbors(df: DataFrame, id_col: str, vec_col: str, *,
                                bucket_length: float = 2.0,
                                num_hash_tables: int = 4,
                                max_l2_distance: float = 5.0,
                                seed: int = 42) -> DataFrame:
    """ANN candidate pairs over embeddings via BucketedRandomProjectionLSH
    (Euclidean). Input array<float> is converted to ml vectors."""
    if not ML_AVAILABLE:  # pragma: no cover
        raise ImportError("pyspark.ml unavailable")
    from pyspark.ml.functions import array_to_vector

    vecs = df.select(F.col(id_col), array_to_vector(F.col(vec_col)).alias("__v__"))
    model = BucketedRandomProjectionLSH(
        inputCol="__v__", outputCol="__hashes__",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    ).fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, max_l2_distance, distCol="l2_dist")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            "l2_dist",
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )

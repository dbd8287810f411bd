"""Persisted dedup index: build MinHash signatures ONCE, reuse forever.

``near_dup_pairs`` (dedup.py) recomputes shingles+signatures per run behind
a ``persist()`` — right for a one-shot query, wrong for the 100 TB corpus a
training-data pipeline dedups repeatedly (nightly crawls, incremental
ingests). This module materializes the two derived tables the pipeline
actually needs:

- ``signatures/``  — one row per doc: id, h0..h{n-1} minhash columns plus
  precomputed band keys (band_0..band_{b-1}). ~100 bytes/doc regardless of
  document size, i.e. ~1% of corpus size: cheap to store, cheap to shuffle.
- ``shingle_sets/`` — one row per doc: id, distinct word-shingle set, used
  only by the exact-Jaccard verify stage on band-collided candidates.

Everything is md5-derived (see dedup.py), so rebuilding any slice of the
index from source docs is bit-for-bit idempotent — the property that makes
at-least-once incremental ETL safe (reference semantics:
activedata_etl/etl.py idempotent etl-key overwrite).

Incremental story (``append_to_index`` + ``pairs_against_index``): new docs
only ever need their OWN signatures computed (scan-local), then one
equi-join of new band keys against the stored band table — never a
recompute over the historical corpus. At 1000 executors the stored
signature table is the small, hot side; the day's delta is the stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import band_keys, jaccard_pairs, minhash_table, shingle_table


def build_index(df: DataFrame, id_col: str, text_col: str, path: str,
                n_hashes: int = 16, n_bands: int = 4,
                shingle_n: int = 3) -> None:
    """Materialize signatures (+band keys) and shingle sets under ``path``.

    One scan of the corpus feeds both tables; the shingle rows shuffle once
    on the doc id (repartition inside shingle_table) and both aggregates
    reuse that partitioning. Band keys are stored denormalized so candidate
    generation later is a pure read + posexplode, no hashing.
    """
    sh = shingle_table(df, id_col, text_col, shingle_n).persist()
    try:
        sig = minhash_table(df, id_col, text_col, n_hashes, shingle_n, sh=sh)
        (sig.select(F.col(id_col).alias("id"), *[F.col(f"h{i}") for i in range(n_hashes)],
                    *band_keys(n_hashes, n_bands))
            .write.mode("overwrite").parquet(os.path.join(path, "signatures")))
        (sh.groupBy(id_col).agg(F.collect_set("__s__").alias("sh"))
           .select(F.col(id_col).alias("id"), "sh")
           .write.mode("overwrite").parquet(os.path.join(path, "shingle_sets")))
    finally:
        sh.unpersist()


def read_signatures(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "signatures"))


def read_shingle_sets(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "shingle_sets"))


def _banded(sig: DataFrame) -> DataFrame:
    bands = sorted(c for c in sig.columns if c.startswith("band_"))
    return sig.select(
        "id",
        F.posexplode(F.array(*[F.col(b) for b in bands])).alias("band_idx", "band_sig"),
    )


def candidate_pairs_from_index(spark: SparkSession, path: str,
                               max_bucket_size: int | None = None) -> DataFrame:
    """LSH candidates from the stored band table — no text scan at all."""
    banded = _banded(read_signatures(spark, path))
    if max_bucket_size is not None:
        from pyspark.sql import Window
        bs = F.count(F.lit(1)).over(Window.partitionBy("band_idx", "band_sig"))
        banded = (banded.withColumn("__bs__", bs)
                  .filter(F.col("__bs__") <= max_bucket_size).drop("__bs__"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_sig") == F.col("b.band_sig"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def near_dup_pairs_from_index(spark: SparkSession, path: str,
                              threshold: float = 0.5,
                              max_bucket_size: int | None = None) -> DataFrame:
    """Full near-dup pairs (candidates + exact-Jaccard verify) from the
    index alone. Identical output to dedup.near_dup_pairs on the same
    corpus/parameters — test_dedup_index asserts this — but the only
    inputs are the two small derived tables."""
    cands = candidate_pairs_from_index(spark, path, max_bucket_size)
    sets_ = read_shingle_sets(spark, path)
    j = (cands
         .join(sets_.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
         .join(sets_.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
         .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
         .withColumn("uni", F.size("sh_a") + F.size("sh_b") - F.col("inter"))
         .withColumn("jaccard", F.col("inter") / F.col("uni")))
    return (j.filter(F.col("jaccard") >= threshold)
             .select("id_a", "id_b", "jaccard"))


def append_to_index(df_new: DataFrame, id_col: str, text_col: str, path: str,
                    n_hashes: int = 16, n_bands: int = 4,
                    shingle_n: int = 3) -> None:
    """Incremental ingest: compute signatures/shingle sets for NEW docs only
    and append. md5 determinism makes re-appending the same docs produce
    identical rows (dedupable by id downstream); the historical corpus is
    never rescanned."""
    sh = shingle_table(df_new, id_col, text_col, shingle_n).persist()
    try:
        sig = minhash_table(df_new, id_col, text_col, n_hashes, shingle_n, sh=sh)
        (sig.select(F.col(id_col).alias("id"), *[F.col(f"h{i}") for i in range(n_hashes)],
                    *band_keys(n_hashes, n_bands))
            .write.mode("append").parquet(os.path.join(path, "signatures")))
        (sh.groupBy(id_col).agg(F.collect_set("__s__").alias("sh"))
           .select(F.col(id_col).alias("id"), "sh")
           .write.mode("append").parquet(os.path.join(path, "shingle_sets")))
    finally:
        sh.unpersist()


def pairs_against_index(df_new: DataFrame, id_col: str, text_col: str,
                        spark: SparkSession, path: str,
                        threshold: float = 0.5, n_hashes: int = 16,
                        n_bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """Near-dup pairs between a NEW batch and the indexed corpus (plus
    within-batch pairs): the nightly-ingest query. Only the delta is
    tokenized; the corpus side is the stored band table. Pair order is
    normalized (id_a < id_b) so output matches a full-corpus run."""
    sh_new = shingle_table(df_new, id_col, text_col, shingle_n)
    sig_new = minhash_table(df_new, id_col, text_col, n_hashes, shingle_n, sh=sh_new)
    banded_new = (sig_new.select(F.col(id_col).alias("id"),
                                 *band_keys(n_hashes, n_bands))
                  .transform(_banded))
    banded_all = banded_new.unionByName(_banded(read_signatures(spark, path)))
    a, b = banded_new.alias("a"), banded_all.alias("b")
    cands = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_sig") == F.col("b.band_sig"))
               & (F.col("a.id") != F.col("b.id")))
        .select(F.least("a.id", "b.id").alias("id_a"),
                F.greatest("a.id", "b.id").alias("id_b"))
        .distinct()
    )
    sets_new = (sh_new.groupBy(id_col).agg(F.collect_set("__s__").alias("sh"))
                .select(F.col(id_col).alias("id"), "sh"))
    sets_ = sets_new.unionByName(read_shingle_sets(spark, path)).dropDuplicates(["id"])
    j = (cands
         .join(sets_.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
         .join(sets_.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
         .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
         .withColumn("uni", F.size("sh_a") + F.size("sh_b") - F.col("inter"))
         .withColumn("jaccard", F.col("inter") / F.col("uni")))
    return (j.filter(F.col("jaccard") >= threshold)
             .select("id_a", "id_b", "jaccard"))

"""Deterministic-sampling [Q] pairs (ext/sampling.py): hash-range
fractional sample, train/val/test split, stratified exact-N draw. All
md5-derived, so the oracle reproduces every sample bit-for-bit — the
reproducibility property that seed-based df.sample cannot give."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ext import sampling as S
from ..io import load_table
from .q_ext import _near_dup_pairs_cte
from .registry import query

_BUCKET = S.sql_hash_bucket("doc_id", salt="s1")


@query(
    "sample_hash_fraction",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE {_BUCKET} < CAST(0.1 * 4294967296 AS BIGINT)
    """,
)
def sample_hash_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample: membership is a pure filter (scan-local,
    pushdown-friendly) and stable under repartition/retry/corpus growth."""
    d = load_table(spark, sf_dir, "documents")
    return S.hash_sample(d, F.col("doc_id"), 0.1, salt="s1").select("doc_id", "lang")


@query(
    "sample_train_val_test",
    oracle=f"""
    WITH labeled AS (
      SELECT lang,
             CASE WHEN {_BUCKET} < CAST(0.8 * 4294967296 AS BIGINT) THEN 'train'
                  WHEN {_BUCKET} < CAST(0.9 * 4294967296 AS BIGINT) THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n FROM labeled GROUP BY split, lang
    """,
)
def sample_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split by disjoint hash ranges; a doc's split never changes
    as other docs arrive (append-consistent across incremental runs)."""
    d = load_table(spark, sf_dir, "documents")
    lab = d.withColumn("split", S.split_label(
        F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s1"))
    return lab.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n"))


@query(
    "sample_stratified_take",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY {S.sql_hash_bucket("doc_id", salt="s2")}, doc_id) AS rk
      FROM documents
    ) WHERE rk <= 20
    """,
)
def sample_stratified_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 docs per language, drawn by hash rank — a reproducible
    uniform per-stratum sample (the balanced-subset op of corpus prep)."""
    d = load_table(spark, sf_dir, "documents")
    return S.stratified_take(d, "lang", F.col("doc_id"), 20, salt="s2") \
        .select("doc_id", "lang")


_MIX_BUCKET = S.sql_hash_bucket("doc_id", salt="mix")


@query(
    "sample_weighted_mixture",
    oracle=f"""
    SELECT source, COUNT(*) AS n, CAST(MIN(doc_id) AS BIGINT) AS min_id
    FROM documents
    WHERE {_MIX_BUCKET} < CASE source
        WHEN 'src0' THEN CAST(1.0 * 4294967296 AS BIGINT)
        WHEN 'src1' THEN CAST(0.5 * 4294967296 AS BIGINT)
        WHEN 'src2' THEN CAST(0.2 * 4294967296 AS BIGINT)
        ELSE CAST(0.05 * 4294967296 AS BIGINT) END
    GROUP BY source
    """,
)
def sample_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction: per-source deterministic keep-rates
    (100% / 50% / 20% / 5% floor) as one scan-local filter."""
    d = load_table(spark, sf_dir, "documents")
    mixed = S.weighted_mixture(
        d, "source", F.col("doc_id"),
        {"src0": 1.0, "src1": 0.5, "src2": 0.2}, default=0.05, salt="mix")
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").cast("bigint").alias("min_id"))


@query(
    "embedding_centroids",
    oracle="""
    WITH ex AS (
      SELECT label, i AS pos, embedding[i] AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ), per_dim AS (
      -- CAST(x AS DOUBLE) first: DuckDB casts FLOAT->DECIMAL via the
      -- float's shortest decimal string, Spark via its exact double value;
      -- promoting to DOUBLE makes both engines round the same ties.
      SELECT label, pos,
             CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(x) AS m
      FROM ex GROUP BY label, pos
    )
    SELECT label, pos - 1 AS pos, m FROM per_dim
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class prototype): posexplode + decimal-sum
    per dimension; emitted long-form (label, pos, m) — array cells are
    driver-unhashable, and long form is what per-dim consumers join on."""
    from ..ext import similarity as SIM

    e = load_table(spark, sf_dir, "embeddings")
    cent = SIM.centroids(e, "label", "embedding")
    return cent.select("label", F.posexplode("centroid").alias("pos", "m")) \
               .withColumn("pos", F.col("pos").cast("long"))


_SHUF_BUCKET = S.sql_hash_bucket("doc_id", salt="ord1")


@query(
    "corpus_global_shuffle",
    oracle=f"""
    SELECT shard, pos, doc_id FROM (
      SELECT doc_id,
             CAST({_SHUF_BUCKET} % 8 AS INT) AS shard,
             ROW_NUMBER() OVER (PARTITION BY {_SHUF_BUCKET} % 8
                                ORDER BY {_SHUF_BUCKET}, doc_id) - 1 AS pos
      FROM documents
    )
    """,
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training order (shard + position
    by hash rank): reproducible across retries/layout, one hash-partition
    shuffle at scale — the safe replacement for orderBy(rand())."""
    d = load_table(spark, sf_dir, "documents")
    return S.global_shuffle(d, F.col("doc_id"), n_shards=8, salt="ord1") \
        .select("shard", "pos", "doc_id")


_DSIR_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"
_DSIR_REF = "('src0', 'src1', 'src2')"


@query(
    "sample_dsir_importance",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_DSIR_TOKS} AS t FROM documents
    ),
    fb AS (
      SELECT doc_id, source,
             CAST(('0x' || substring(md5(
               list_extract(t, i) || ' ' || list_extract(t, i + 1)
             ), 1, 8)) AS BIGINT) % 4096 AS b
      FROM toks, LATERAL (
        SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
    ),
    feats AS (SELECT doc_id, b, COUNT(*) AS c FROM fb GROUP BY doc_id, b),
    tgt AS (SELECT b, COUNT(*) AS n_t FROM fb
            WHERE source IN {_DSIR_REF} GROUP BY b),
    rawc AS (SELECT b, SUM(c) AS n_r FROM feats GROUP BY b),
    nt AS (SELECT SUM(n_t) AS tot_t FROM tgt),
    nr AS (SELECT SUM(n_r) AS tot_r FROM rawc),
    terms AS (
      SELECT f.doc_id, f.b, f.c,
             CAST(f.c AS DOUBLE) * (
               (CAST(COALESCE(t.n_t, 0) + 1 AS DOUBLE)
                  / CAST(nt.tot_t + 4096 AS DOUBLE))
               / ((CAST(COALESCE(t.n_t, 0) + 1 AS DOUBLE)
                     / CAST(nt.tot_t + 4096 AS DOUBLE))
                  + (CAST(COALESCE(r.n_r, 0) + 1 AS DOUBLE)
                       / CAST(nr.tot_r + 4096 AS DOUBLE)))
             ) AS term
      FROM feats f LEFT JOIN tgt t USING (b) LEFT JOIN rawc r USING (b)
      CROSS JOIN nt CROSS JOIN nr
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_feats,
           list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY b)),
             (acc, v) -> acc + v) / CAST(SUM(c) AS DOUBLE) AS score
    FROM terms GROUP BY doc_id
    """,
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023: importance resampling
    over hashed n-gram features toward a trusted target) with the same
    trusted slice as the CCNet LM filter (3 of 20 sources). The weight
    is the log-free posterior form (ext/sampling.importance_scores
    docstring) so the full score geometry hash-matches the oracle;
    selection = any deterministic cut over (score, doc_id) downstream.
    Plan: model tables ≤4096 rows broadcast onto the per-doc feature
    counts, one groupBy(doc) closes — raw features are the only
    corpus-sized shuffle."""
    d = load_table(spark, sf_dir, "documents")
    ref = d.filter(F.col("source").isin("src0", "src1", "src2"))
    return S.importance_scores(d, ref, "doc_id", "text",
                               n=2, buckets=4096)


@query(
    "sample_leakage_safe_split",
    oracle="""
    WITH RECURSIVE """ + _near_dup_pairs_cte(0.2) + f""",
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst <> r.src
    ),
    comp AS (
      SELECT src AS doc_id, least(src, MIN(dst)) AS cluster_id
      FROM reach GROUP BY src
    ),
    labeled AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c USING (doc_id)
    )
    SELECT doc_id, cluster_id,
           CASE WHEN {S.sql_hash_bucket("cluster_id", salt="leak1")}
                     < 3435973836 THEN 'train'
                WHEN {S.sql_hash_bucket("cluster_id", salt="leak1")}
                     < 3865470565 THEN 'val'
                ELSE 'test' END AS split
    FROM labeled
    """,
)
def sample_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate documents MUST
    land in the same split (a test doc with a train-set near-copy leaks
    the answer — the eval-contamination failure mode dedup exists to
    prevent), so the split hash keys on the near-dup CLUSTER id (min-id
    label propagation over verified LSH pairs), not the doc id;
    singletons key on their own id, identical to a plain doc-hash split.
    Same-cluster-same-split holds by CONSTRUCTION (one hash per
    cluster); the oracle re-derives clusters via the recursive-CTE
    reachability and must match every label. Plan: the pairs + 
    components chain is the dedup pipeline already priced in SCALE.md;
    the split itself adds one scan-local hash."""
    from ..ext import dedup as DD

    d = load_table(spark, sf_dir, "documents")
    pairs = DD.near_dup_pairs(d, "doc_id", "text", threshold=0.2)
    comp = DD.connected_components(pairs) \
        .select(F.col("id").alias("doc_id"), "cluster_id")
    lab = (d.select("doc_id").join(comp, "doc_id", "left")
           .withColumn("cluster_id",
                       F.coalesce("cluster_id", F.col("doc_id"))))
    return lab.withColumn("split", S.split_label(
        F.col("cluster_id"), {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="leak1"))

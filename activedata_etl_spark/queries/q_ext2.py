"""Extension ops round 2: embedding-cosine near-dup, BPE-ish token
counting, rolling-hash fingerprints — completing the north-star dedup/
text-analysis menu."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ext import similarity as SIM
from ..ext import text as TX
from ..io import load_table
from .registry import query

_COS = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)


def _cos_sql(a: str, b: str) -> str:
    return (f"{_COS.format(a=a, b=b)} / (sqrt({_COS.format(a=a, b=a)})"
            f" * sqrt({_COS.format(a=b, b=b)}))")


def _band_sig_sql(band: int, n_bits: int = 16) -> str:
    lo, hi = band * n_bits + 1, (band + 1) * n_bits
    return (f"array_to_string(list_transform(list_slice(embedding, {lo}, {hi}),"
            " x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')")


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, embedding FROM embeddings
    ), bands AS (
      SELECT vec_id, embedding, b.band_idx, b.band_sig FROM corpus,
        LATERAL (SELECT * FROM (VALUES
          (0, {_band_sig_sql(0)}),
          (1, {_band_sig_sql(1)}),
          (2, {_band_sig_sql(2)}),
          (3, {_band_sig_sql(3)})
        ) v(band_idx, band_sig)) b
    )
    SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b,
           {_cos_sql('a.embedding', 'c.embedding')} AS cos
    FROM bands a JOIN bands c
      ON a.band_idx = c.band_idx AND a.band_sig = c.band_sig
     AND a.vec_id < c.vec_id
    WHERE {_cos_sql('a.embedding', 'c.embedding')} >= 0.95
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via BANDED sign-LSH blocking (4 bands ×
    16 bits — 2^16 buckets per band, vs the old single 8-bit key whose
    256-bucket universe went quadratic at corpus scale) with an
    exact-vector dedup prepass so bit-identical copies never inflate the
    pairwise stage. The fixture embeddings are random (max natural pair
    cosine ≈ 0.48), so the corpus is the table unioned with an id-shifted
    copy — every original must pair with its copy at cosine ≈ 1; the
    oracle states the blocking relation directly (no prepass) and must
    agree exactly, proving the prepass+expansion is semantics-preserving."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding"))
    return SIM.cosine_dedup_pairs(corpus, "vec_id", "embedding", threshold=0.95)


@query(
    "dedup_embedding_cosine_bulk",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id + (i - 1) * 1000000 AS vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) * i)
               AS embedding
      FROM embeddings, UNNEST(range(1, 11)) AS u(i)
    ), bands AS (
      SELECT vec_id, embedding, b.band_idx, b.band_sig FROM corpus,
        LATERAL (SELECT * FROM (VALUES
          (0, {_band_sig_sql(0)}),
          (1, {_band_sig_sql(1)}),
          (2, {_band_sig_sql(2)}),
          (3, {_band_sig_sql(3)})
        ) v(band_idx, band_sig)) b
    )
    SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b,
           {_cos_sql('a.embedding', 'c.embedding')} AS cos
    FROM bands a JOIN bands c
      ON a.band_idx = c.band_idx AND a.band_sig = c.band_sig
     AND a.vec_id < c.vec_id
    WHERE {_cos_sql('a.embedding', 'c.embedding')} >= 0.95
    """,
)
def dedup_embedding_cosine_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_embedding_cosine at BULK pairwise load — the benchmarked
    form (VERDICT r6 #3: the 0.12s original printed phantom >1.5x
    readings from ambient noise two rounds straight; the
    sim_ann_multiprobe_bulk pattern fixes the class). The corpus is TEN
    positively-scaled copies of each vector (factor i = 1..10): scaling
    preserves every sign bit (same band signatures) and cosine exactly 1
    per base, but the copies are NOT bit-identical, so they pass the
    exact-vector prepass and drive the full banded sign-LSH pairwise
    path — 45 verified pairs per base vector, 10x the corpus rows, the
    join dominating fixed overhead. Both engines build the scaled
    vectors with the same op order (float→double cast, then one double
    multiply), so every cosine is bit-identical to the oracle's."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # r13 opt (guide §2.4/§6): the 10 scaled copies were a 10-way union
    # of 10 SEPARATE parquet scans (plan: 10× Scan parquet + Union).
    # One scan + a posexplode of the 10 per-row scaled vectors builds the
    # identical corpus rows in a single Generate. Value equivalence: the
    # scale factor is cast int→double exactly (i ≤ 10), and
    # double(x) * double(i) is the same op order as before, so every
    # vector is bit-identical; vec_id arithmetic is the same bigint
    # expression. Plan diff: 10 Scan parquet → 1, Union(10) → Generate.
    factors = F.sequence(F.lit(1), F.lit(10))
    corpus = (
        emb.select(
            "vec_id",
            F.posexplode(F.transform(
                factors,
                lambda i: F.transform(
                    "embedding",
                    lambda x: x.cast("double") * i.cast("double")),
            )).alias("__i0__", "embedding"))
        .select((F.col("vec_id") + F.col("__i0__") * 1000000)
                .cast("bigint").alias("vec_id"),
                "embedding"))
    return SIM.cosine_dedup_pairs(corpus, "vec_id", "embedding",
                                  threshold=0.95)


@query(
    "text_bpe_token_counts",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+'))  AS n_bpe,
           len(list_distinct(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+'))) AS n_bpe_distinct,
           len(string_split_regex(lower(trim(text)), '\s+'))               AS n_ws
    FROM documents
    """,
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways: BPE-ish pretokens (budgeting) vs
    whitespace tokens (dedup shingling)."""
    d = load_table(spark, sf_dir, "documents")
    bpe = TX.bpe_ish_tokens("text")
    return d.select(
        "doc_id",
        F.size(bpe).alias("n_bpe"),
        F.size(F.array_distinct(bpe)).alias("n_bpe_distinct"),
        F.size(TX.tokens("text")).alias("n_ws"),
    )


@query(
    "text_rolling_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split_regex(lower(trim(text)), '\\s+'),
                 t -> (length(t) * 31 + ascii(t)) % 1000000007)),
             (acc, v) -> (acc * 131 + v) % 1000000007) AS fp
    FROM documents
    """,
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial rolling hash over the token sequence
    (same token order, different docs → different fp; anagram docs that
    fool set-based minhash do NOT collide here)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.rolling_hash(TX.tokens("text")).alias("fp"))

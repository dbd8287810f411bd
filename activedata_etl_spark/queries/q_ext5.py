"""Extension ops round 4: reference-LM quality scoring and the other
r4 training-data additions.

Oracle strategy (same as q_ext4): no transcendental functions cross the
engine boundary — ln() differs in the last ulp between Spark and DuckDB
(measured) — so every float is built from integer-operand IEEE division
and fixed-order double summation, which are bit-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ext import text as TX
from ..io import load_table
from .registry import query

_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"

# reference slice for the LM: three of the twenty synthetic sources
_LM_REF = "('src0', 'src1', 'src2')"


@query(
    "text_lm_quality_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS} AS t FROM documents
    ),
    doc_bg AS (
      SELECT doc_id, i - 1 AS pos,
             list_extract(t, i) || ' ' || list_extract(t, i + 1) AS bg,
             list_extract(t, i) AS w1
      FROM toks, LATERAL (
        SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
    ),
    ref_uni AS (
      SELECT w, COUNT(*) AS c1 FROM (
        SELECT unnest(t) AS w FROM toks WHERE source IN {_LM_REF})
      GROUP BY w
    ),
    ref_bg AS (
      SELECT bg, COUNT(*) AS c12 FROM doc_bg
      JOIN documents USING (doc_id) WHERE source IN {_LM_REF}
      GROUP BY bg
    ),
    vocab AS (SELECT COUNT(*) AS v FROM ref_uni),
    scored AS (
      SELECT d.doc_id, d.pos,
             r.c12 IS NULL AS unseen,
             CAST(COALESCE(r.c12, 0) + 1 AS DOUBLE)
               / CAST(COALESCE(u.c1, 0) + vocab.v AS DOUBLE) AS p
      FROM doc_bg d
      LEFT JOIN ref_bg r USING (bg)
      LEFT JOIN ref_uni u ON d.w1 = u.w
      CROSS JOIN vocab
    )
    SELECT doc_id,
           COUNT(*)                                   AS n_bigrams,
           CAST(SUM(CASE WHEN unseen THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
           list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE), list(p ORDER BY pos)),
             (acc, v) -> acc + v) / COUNT(*)          AS mean_p
    FROM scored GROUP BY doc_id
    """,
)
def text_lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style model-based quality filter (Wenzek et al. 2019 train a
    KenLM on Wikipedia and score the crawl): a bigram LM with add-one
    smoothing is built from a trusted reference slice (3 of the 20
    sources), then EVERY document is scored by its mean transition
    probability and unseen-bigram count — the ranking signal a
    perplexity threshold uses, formulated log-free so it is bit-exactly
    oracle-checkable (see module docstring). Plan: two count shuffles
    over the reference slice, broadcast model join onto the exploded
    corpus bigrams, one groupBy(doc) — at 100 TB the model tables stay
    broadcast-small because the trusted slice is a sliver of the crawl."""
    d = load_table(spark, sf_dir, "documents")
    ref = d.filter(F.col("source").isin("src0", "src1", "src2"))
    return TX.bigram_lm_score(d, ref, "doc_id", "text")


def _qcodes_sql(source: str = "embeddings") -> str:
    return f"""
    qv AS (
      SELECT vec_id,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s,
             embedding
      FROM {source}
    ),
    codes AS (
      SELECT vec_id,
             CASE WHEN s > 0 THEN list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) / s + 0.5) AS BIGINT))
                  ELSE list_transform(embedding, x -> CAST(0 AS BIGINT))
             END AS q
      FROM qv
    )"""


_QCODES = _qcodes_sql()

_IDOT = "CAST(list_sum(list_transform(list_zip({a}, {b}), p -> p[1]*p[2])) AS DOUBLE)"


@query(
    "sim_ann_quantized_topk",
    oracle=f"""
    WITH {_QCODES},
    scored AS (
      SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
             {_IDOT.format(a='a.q', b='b.q')}
               / (sqrt({_IDOT.format(a='a.q', b='a.q')})
                  * sqrt({_IDOT.format(a='b.q', b='b.q')})) AS qcos
      FROM codes a, codes b
      WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
    )
    SELECT q_id, vec_id, qcos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY qcos DESC, vec_id ASC) AS rn
      FROM scored) WHERE rn <= 3
    """,
)
def sim_ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k search over INT8-quantized embeddings (ext/similarity.py
    quantize_int8): the 4×-memory-reduction path for 100 TB ANN. The
    quantized cosine is pure integer dot products (scales cancel), so
    unlike float accumulation it is bit-deterministic under ANY
    partitioning — the oracle replicates quantization + integer dots and
    must agree to the last bit. Brute-force form here (the exactness
    baseline); the codes drop into the same sign-LSH/IVF blocking as the
    float path since sign(q_i) = sign(x_i)."""
    from ..ext import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    codes = emb.select("vec_id", SIM.quantize_int8(F.col("embedding"))["q"].alias("q"))
    q = (codes.filter(F.col("vec_id") < 10)
         .select(F.col("vec_id").alias("q_id"), F.col("q").alias("qq")))
    scored = (q.crossJoin(codes)
              .filter(F.col("q_id") != F.col("vec_id"))
              .withColumn("qcos", SIM.quantized_cosine(F.col("qq"), F.col("q"))))
    return SIM.topk_per_query(scored, "q_id", "qcos", "vec_id", 3) \
        .select("q_id", "vec_id", "qcos")


def _band_index_oracle(threshold: float = 0.95, n_bits: int = 16,
                       n_bands: int = 4) -> str:
    """Blocking from FLOAT band signs, scores from int8 codes — stated
    with neither the persisted index nor the fan-out construction."""
    def band_sig(b: int) -> str:
        lo, hi = b * n_bits + 1, (b + 1) * n_bits
        return (f"array_to_string(list_transform(list_slice(embedding, {lo}, {hi}),"
                " x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')")

    values = ",\n          ".join(f"({b}, {band_sig(b)})" for b in range(n_bands))
    qcos = (f"{_IDOT.format(a='a.q', b='c.q')}"
            f" / (sqrt({_IDOT.format(a='a.q', b='a.q')})"
            f" * sqrt({_IDOT.format(a='c.q', b='c.q')}))")
    return f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, embedding FROM embeddings
    ),
    {_qcodes_sql('corpus')},
    bands AS (
      SELECT vec_id, b.band_idx, b.band_sig FROM corpus,
        LATERAL (SELECT * FROM (VALUES
          {values}
        ) t(band_idx, band_sig)) b
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
      FROM bands a JOIN bands c
        ON a.band_idx = c.band_idx AND a.band_sig = c.band_sig
       AND a.vec_id < c.vec_id
    )
    SELECT id_a, id_b, {qcos} AS qcos
    FROM cand JOIN codes a ON cand.id_a = a.vec_id
              JOIN codes c ON cand.id_b = c.vec_id
    WHERE {qcos} >= {threshold}"""


@query("sim_band_index_pairs", oracle=_band_index_oracle())
def sim_band_index_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs answered from the PERSISTED quantized embedding
    index alone (ext/similarity.py build_band_index /
    pairs_from_band_index): one index row per vector holds int8 codes
    (4× smaller than the floats) plus float-sign band keys, so the
    pairwise stage never rereads the embedding table — the vector twin of
    dedup_index_query. The duplicated corpus guarantees signal (random
    fixture vectors never reach τ=0.95); the oracle states
    blocking-by-float-signs + integer-dot cosine with no index and no
    prepass, proving the persisted path is semantics-preserving."""
    import os
    import tempfile

    from ..ext import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding"))
    path = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_band_index_{os.path.basename(sf_dir.rstrip('/'))}")
    SIM.build_band_index(corpus, "vec_id", "embedding", path)
    return SIM.pairs_from_band_index(spark, path, threshold=0.95)

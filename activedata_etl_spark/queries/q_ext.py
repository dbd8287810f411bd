"""Extension-operator [Q] pairs (north-star §2.11): text analysis, dedup
(exact / minhash-LSH / jaccard), similarity search, multimodal plumbing.

Oracle strategy: everything hash-based uses md5 so DuckDB reproduces it
exactly; vector math is double-precision sequential folds on both sides.
Only the xxhash64 SimHash fast path is rows-only (no portable xxhash in
the oracle engine) — its md5 twin `dedup_simhash_pairs` is fully paired,
as are the mapInPandas feature extraction (byte-deterministic fake
decoder over an ASCII corpus) and the IVF ANN (CTE-unrolled k-means).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ext import dedup as DD
from ..ext import multimodal as MM
from ..ext import similarity as SIM
from ..ext import text as TX
from ..io import load_table
from .registry import query, scratch_dir

# DuckDB-side shared fragments (mirror ext/text.py definitions)
_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"
_SHINGLES = (
    "list_distinct(list_transform("
    " range(1, greatest(len({t}) - 2, 0) + 1),"
    " i -> array_to_string(list_slice({t}, i, i + 2), ' ')))"
).format(t=_TOKS)
_FP = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           length(text)                         AS q_chars,
           len({_TOKS})                         AS q_tokens,
           len(list_distinct({_TOKS}))          AS q_distinct_tokens,
           len(list_distinct({_TOKS})) * 1.0 / len({_TOKS})  AS q_ttr,
           (length(text) - len({_TOKS}) + 1) * 1.0 / len({_TOKS}) AS q_mean_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", *TX.quality_metrics("text"))


_NGRAMS = (
    "list_transform("
    " range(1, greatest(len({t}) - 2, 0) + 1),"
    " i -> array_to_string(list_slice({t}, i, i + 2), ' '))"
).format(t=_TOKS)


@query(
    "text_repetition_ratio",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN len({_NGRAMS}) > 0
                THEN 1 - len(list_distinct({_NGRAMS})) * 1.0 / len({_NGRAMS})
           END AS rep3
    FROM documents
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc duplicated-3-gram fraction — the Gopher/C4-style
    repetition quality signal; boilerplate/spam scores high. Scan-local."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id",
                    TX.repetition_ratio(TX.tokens("text"), 3).alias("rep3"))


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    n AS (
      SELECT doc_id, toks,
             greatest(CAST(ceil((len(toks) - 32) / 16.0) AS INT) + 1, 1) AS nc
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, k AS chunk_idx,
           len(list_slice(toks, k * 16 + 1, k * 16 + 32)) AS chunk_len,
           array_to_string(list_slice(toks, k * 16 + 1, k * 16 + 32), ' ') AS chunk_text
    FROM n, UNNEST(range(0, nc)) AS u(k)
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: 32-token windows, 16-token stride
    (overlapping sliding windows), one output row per chunk — the
    sequence-prep fan-out before packing/tokenization."""
    d = load_table(spark, sf_dir, "documents")
    chunks = TX.chunk_tokens(TX.tokens("text"), window=32, stride=16)
    return (d.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
            .select("doc_id", "chunk_idx",
                    F.size("chunk").alias("chunk_len"),
                    F.array_join("chunk", " ").alias("chunk_text")))


@query(
    "text_top_terms",
    oracle=f"""
    SELECT tok, COUNT(*) AS n FROM (
      SELECT unnest({_TOKS}) AS tok FROM documents
    ) GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 25
    """,
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies (explode → count → top-k)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(25)
    )


@query(
    "text_tf_df",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
      ) GROUP BY doc_id, tok
    ), df AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.tok, tf.tf, df.df,
           tf.tf * (SELECT n_docs FROM n) * 1.0 / df.df AS tf_scaled
    FROM tf JOIN df USING (tok)
    WHERE tf.doc_id < 20
    """,
)
def text_tf_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf building blocks. Scaled tf uses a rational (tf·N/df) rather
    than ln(): log is not correctly-rounded and differs across libm
    implementations — same trap as pow(x, 1.5)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(TX.tokens("text")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))  # 1-row frame, broadcast — no collect
    return (
        tf.join(df_, "tok")
        .filter(F.col("doc_id") < 20)
        .crossJoin(F.broadcast(n))
        .select("doc_id", "tok", "tf", "df",
                (F.col("tf") * F.col("n_docs") * 1.0 / F.col("df")).alias("tf_scaled"))
    )


@query(
    "text_lang_id",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
        len(list_intersect(string_split_regex(lower(trim(text)), '\\s+'),
            ['der','die','und','das','nicht'])) AS s_de,
        len(list_intersect(string_split_regex(lower(trim(text)), '\\s+'),
            ['the','and','of','to','is'])) AS s_en,
        len(list_intersect(string_split_regex(lower(trim(text)), '\\s+'),
            ['el','la','los','que','de'])) AS s_es,
        len(list_intersect(string_split_regex(lower(trim(text)), '\\s+'),
            ['le','la','et','les','des'])) AS s_fr,
        len(list_intersect(string_split_regex(lower(trim(text)), '\\s+'),
            ['的','是','了','在','我'])) AS s_zh
      FROM documents
    )
    SELECT doc_id, lang,
      CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
           WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
           WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
           WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
           WHEN s_fr >= s_zh THEN 'fr'
           ELSE 'zh' END AS lang_guess
    FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID; tie → lexicographically first code
    (the oracle's >= cascade encodes the same rule)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", TX.lang_id(TX.tokens("text")).alias("lang_guess"))


@query(
    "dedup_exact_groups",
    oracle=f"""
    SELECT {_FP} AS fp, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return DD.exact_dedup_groups(d, "text", "doc_id")


def _duck_minhash_cols(n_hashes: int = 16) -> str:
    """Oracle mirror of ext.dedup.minhash_table's aggregation."""
    return ", ".join(
        f"min(md5('{i}:' || s)) AS h{i}" for i in range(n_hashes)
    )


_DUCK_SIG = f"""
      sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
      ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
      sig AS (SELECT doc_id, {_duck_minhash_cols(16)} FROM ex GROUP BY doc_id)
"""


@query(
    "dedup_minhash_bands",
    oracle=f"""
    WITH {_DUCK_SIG}
    SELECT doc_id,
           md5(h0  || '|' || h1  || '|' || h2  || '|' || h3)  AS band_0,
           md5(h4  || '|' || h5  || '|' || h6  || '|' || h7)  AS band_1,
           md5(h8  || '|' || h9  || '|' || h10 || '|' || h11) AS band_2,
           md5(h12 || '|' || h13 || '|' || h14 || '|' || h15) AS band_3
    FROM sig
    """,
)
def dedup_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature → LSH band keys per document (the blocking keys
    the candidate join shuffles on)."""
    d = load_table(spark, sf_dir, "documents")
    return DD.minhash_table(d, "doc_id", "text").select("doc_id", *DD.band_keys())


@query(
    "dedup_lsh_jaccard_pairs",
    oracle=f"""
    WITH {_DUCK_SIG}, banded AS (
      SELECT doc_id, b.band_idx, b.band_sig FROM sig,
        LATERAL (SELECT * FROM (VALUES
          (0, md5(h0  || '|' || h1  || '|' || h2  || '|' || h3)),
          (1, md5(h4  || '|' || h5  || '|' || h6  || '|' || h7)),
          (2, md5(h8  || '|' || h9  || '|' || h10 || '|' || h11)),
          (3, md5(h12 || '|' || h13 || '|' || h14 || '|' || h15))
        ) v(band_idx, band_sig)) b
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           len(list_intersect(sa.sh, sb.sh)) * 1.0 /
           (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0 /
          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.2
    """,
)
def dedup_lsh_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup pipeline: MinHash → LSH bands → candidate pairs →
    exact Jaccard verify. Both engines run the identical construction."""
    d = load_table(spark, sf_dir, "documents")
    return DD.near_dup_pairs(d, "doc_id", "text", threshold=0.2)


def _simhash_sig_oracle() -> str:
    """CTE chain reproducing simhash64_md5 bit-for-bit (md5 hex digits →
    64 majority votes → signed-bigint signature)."""
    digits = ",\n        ".join(
        f"strpos('0123456789abcdef', substring(hx, {i + 1}, 1)) - 1 AS d{i}"
        for i in range(16))
    votes = ",\n        ".join(
        f"SUM(CASE WHEN ((d{b // 4} >> {b % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(64))
    bits = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({(1 << b) if b < 63 else -(1 << 63)} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for b in range(64))
    return f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
    h AS (SELECT doc_id, md5(t) AS hx FROM toks),
    d AS (SELECT doc_id,
        {digits}
      FROM h),
    v AS (SELECT doc_id,
        {votes}
      FROM d GROUP BY doc_id)
    SELECT doc_id, {bits} AS simhash FROM v"""


@query("dedup_simhash", oracle=_simhash_sig_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 64-bit SimHash signature table (md5-portable bits, so the
    oracle reproduces it exactly). The xxhash64 fast path
    (``DD.simhash64``) keeps the same plan shape and is pytest-covered
    for partition invariance; prefer it when no cross-engine parity is
    needed."""
    d = load_table(spark, sf_dir, "documents")
    return DD.simhash64_md5(d, "doc_id", TX.tokens("text"))


@query(
    "sim_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.q_id, c.vec_id,
        list_sum(list_transform(list_zip(q.q_vec, c.embedding),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(list_zip(q.q_vec, q.q_vec),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))))
         * sqrt(list_sum(list_transform(list_zip(c.embedding, c.embedding),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))))) AS cos
      FROM q, embeddings c WHERE q.q_id <> c.vec_id
    )
    SELECT q_id, vec_id, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 5 vectors as queries."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return SIM.cosine_topk(q, emb, "q_id", "q_vec", "vec_id", "embedding", k=5)


@query(
    "sim_ann_sign_lsh",
    oracle="""
    WITH b AS (
      SELECT vec_id, embedding,
             array_to_string(list_transform(list_slice(embedding, 1, 8),
               x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
      FROM embeddings
    ), q AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket FROM b WHERE vec_id < 20),
    scored AS (
      SELECT q.q_id, c.vec_id,
        list_sum(list_transform(list_zip(q.q_vec, c.embedding),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(list_zip(q.q_vec, q.q_vec),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))))
         * sqrt(list_sum(list_transform(list_zip(c.embedding, c.embedding),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))))) AS cos
      FROM q JOIN b c USING (bucket) WHERE q.q_id <> c.vec_id
    )
    SELECT q_id, vec_id, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def sim_ann_sign_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN (sign-LSH): same-bucket candidates only — the search
    becomes an equi-join, the 100 TB-viable plan."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return SIM.ann_sign_lsh_topk(q, emb, "q_id", "q_vec", "vec_id", "embedding", k=3)


@query(
    "sim_ann_multiprobe",
    oracle="""
    WITH b AS (
      SELECT vec_id, embedding,
             array_to_string(list_transform(list_slice(embedding, 1, 8),
               x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
      FROM embeddings
    ), q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 20),
    probes AS (
      SELECT q_id, q_vec,
             array_to_string(list_transform(range(1, 9),
               j -> CASE
                 WHEN j = k THEN (CASE WHEN q_vec[j] >= 0 THEN '0' ELSE '1' END)
                 ELSE          (CASE WHEN q_vec[j] >= 0 THEN '1' ELSE '0' END)
               END), '') AS bucket
      FROM q, UNNEST(range(0, 9)) AS u(k)
    ),
    scored AS (
      SELECT p.q_id, c.vec_id,
        list_sum(list_transform(list_zip(p.q_vec, c.embedding),
                 t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(list_zip(p.q_vec, p.q_vec),
                 t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))))
         * sqrt(list_sum(list_transform(list_zip(c.embedding, c.embedding),
                 t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))))) AS cos
      FROM probes p JOIN b c USING (bucket) WHERE p.q_id <> c.vec_id
    )
    SELECT q_id, vec_id, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def sim_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN with single-bit multi-probe (own bucket + 8 one-flip
    neighbors per query) — the recall lever over sim_ann_sign_lsh at the
    same equi-join plan shape."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return SIM.ann_multiprobe_topk(q, emb, "q_id", "q_vec",
                                   "vec_id", "embedding", k=3)


@query(
    "sim_ann_multiprobe_bulk",
    oracle="""
    WITH b AS (
      SELECT vec_id, embedding,
             array_to_string(list_transform(list_slice(embedding, 1, 8),
               x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
      FROM embeddings
    ), q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
             WHERE vec_id % 5 = 0),
    probes AS (
      SELECT q_id, q_vec,
             array_to_string(list_transform(range(1, 9),
               j -> CASE
                 WHEN j = k THEN (CASE WHEN q_vec[j] >= 0 THEN '0' ELSE '1' END)
                 ELSE          (CASE WHEN q_vec[j] >= 0 THEN '1' ELSE '0' END)
               END), '') AS bucket
      FROM q, UNNEST(range(0, 9)) AS u(k)
    ),
    scored AS (
      SELECT p.q_id, c.vec_id,
        list_sum(list_transform(list_zip(p.q_vec, c.embedding),
                 t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(list_zip(p.q_vec, p.q_vec),
                 t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))))
         * sqrt(list_sum(list_transform(list_zip(c.embedding, c.embedding),
                 t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))))) AS cos
      FROM probes p JOIN b c USING (bucket) WHERE p.q_id <> c.vec_id
    )
    SELECT q_id, vec_id, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def sim_ann_multiprobe_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim_ann_multiprobe at BULK probe load (every 5th vector is a query
    — 20x the query rows) so the measured region is dominated by the
    bucketed equi-join, not session fixed overhead. VERDICT r5 #7: the
    40ms original made the bench 2x gate meaningless for the ANN family
    (one GC pause > the query); this is the benchmarked form."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return SIM.ann_multiprobe_topk(q, emb, "q_id", "q_vec",
                                   "vec_id", "embedding", k=3)


@query("sim_ann_multiprobe_bulk_auto")
def sim_ann_multiprobe_bulk_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim_ann_multiprobe_bulk with the corpus-adaptive band width
    (``n_bits="auto"`` — ~log2(n/64) bits, bucket occupancy bounded as
    the corpus grows). Rows-only registration (VERDICT r8 #6): the width
    depends on a corpus count, so a fixed SQL oracle can't state it —
    the fixed-width twin carries the value oracle; THIS form exists so
    the sf1 scale adjudication ("the knob scales in production") is
    MEASURED on the rig rather than argued. Expected sf1/sf0.1 wall
    ratio ≲12× where the fixed form shows ~59× (BASELINE.md)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return SIM.ann_multiprobe_topk(q, emb, "q_id", "q_vec",
                                   "vec_id", "embedding", k=3,
                                   n_bits="auto")


@query(
    "sim_norms_by_label",
    oracle="""
    SELECT label,
           COUNT(*) AS n,
           MIN(sqrt(list_sum(list_transform(list_zip(embedding, embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))))) AS min_norm,
           MAX(sqrt(list_sum(list_transform(list_zip(embedding, embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))))) AS max_norm
    FROM embeddings GROUP BY label
    """,
)
def sim_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    n = SIM.norm(F.col("embedding"))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(n).alias("min_norm"),
        F.max(n).alias("max_norm"),
    )


@query(
    "multimodal_payload_stats",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text)                  AS checksum,
           'text/plain'               AS mime
    FROM documents
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata plumbing (pack side)."""
    d = load_table(spark, sf_dir, "documents")
    mm = MM.pack(d, "doc_id", "text", "text/plain")
    return mm.select(
        F.col("id").alias("doc_id"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
        F.col("meta.mime").alias("mime"),
    )


@query(
    "multimodal_fake_features",
    # The mapInPandas plumbing is the thing under test; the fake decoder is
    # byte-deterministic (first 8 payload bytes / 255), and the corpus is
    # pure ASCII (verified: max codepoint 121), so the oracle reproduces the
    # features with ascii(substring(...)) — char == byte here.
    oracle=f"""
    SELECT doc_id AS id, 'text/plain' AS mime,
           octet_length(encode(text)) AS n_bytes,
           t.i AS pos,
           CASE WHEN t.i < length(text)
                THEN ascii(substring(text, CAST(t.i + 1 AS INT), 1)) / 255.0
                ELSE 0.0 END AS feature
    FROM documents, range(0, {MM.FEATURE_DIM}) t(i)
    """,
)
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one row per (doc, dim): array cells are driver-unhashable, and the
    # long form is also what a downstream per-dim agg would consume
    d = load_table(spark, sf_dir, "documents")
    feats = MM.extract_features(MM.pack(d, "doc_id", "text", "text/plain"), fake=True)
    return feats.select(
        "id", "mime", "n_bytes",
        F.posexplode("features").alias("pos", "feature"),
    ).withColumn("pos", F.col("pos").cast("long"))


# --- IVF ANN (oracle = the same deterministic k-means, CTE-unrolled) ----

def _sql_dot(a: str, b: str) -> str:
    return f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"


def _sql_cos(a: str, b: str) -> str:
    return f"({_sql_dot(a, b)} / (sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)})))"


def _ivf_ctes(nlist: int, n_iter: int, source: str = "embeddings") -> list[str]:
    """CTE chain mirroring similarity.ivf_build: deterministic lowest-id
    seeding, ``n_iter`` unrolled Lloyd iterations with floor-quantized
    integer-sum per-dimension means (tie-rule-free, see similarity.ivf_build), final assignment ``af`` against centroids
    ``c{n_iter}``. Shared by the IVF-ANN, semantic-dedup, and fused
    banded-refinement oracles (``source`` lets a caller cluster a derived
    corpus CTE instead of the base table)."""
    cos = _sql_cos
    ctes = [
        "v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))"
        f" AS vv FROM {source})",
        f"c0 AS (SELECT vec_id AS cid, vv AS cvec FROM v ORDER BY vec_id LIMIT {nlist})",
    ]
    for i in range(n_iter):
        ctes.append(f"""a{i + 1} AS (
          SELECT vec_id, vv, cid FROM (
            SELECT v.vec_id, v.vv, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                     ORDER BY {cos('v.vv', 'c.cvec')} DESC, c.cid ASC) AS rn
            FROM v, c{i} c) WHERE rn = 1)""")
        ctes.append(f"""c{i + 1} AS (
          SELECT cid, list(m ORDER BY i) AS cvec FROM (
            SELECT cid, i,
                   CAST(CAST(SUM(CAST(floor(x * CAST(1000000000 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS DOUBLE)
                     / (COUNT(x) * CAST(1000000000 AS DOUBLE)) AS m
            FROM (SELECT cid, unnest(vv) AS x, generate_subscripts(vv, 1) AS i
                  FROM a{i + 1})
            GROUP BY cid, i) GROUP BY cid)""")
    ctes.append(f"""af AS (
      SELECT vec_id, vv, cid FROM (
        SELECT v.vec_id, v.vv, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                 ORDER BY {cos('v.vv', 'c.cvec')} DESC, c.cid ASC) AS rn
        FROM v, c{n_iter} c) WHERE rn = 1)""")
    return ctes


def _ivf_oracle(nlist: int = 16, n_iter: int = 2, n_queries: int = 10,
                k: int = 3, nprobe: int = 2) -> str:
    """Full IVF-ANN oracle: the shared k-means chain + nprobe search."""
    cos = _sql_cos
    ctes = _ivf_ctes(nlist, n_iter)
    ctes.append(f"""probes AS (
      SELECT q_id, qv, cid FROM (
        SELECT q.vec_id AS q_id, q.vv AS qv, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY {cos('q.vv', 'c.cvec')} DESC, c.cid ASC) AS rn
        FROM v q, c{n_iter} c WHERE q.vec_id < {n_queries})
      WHERE rn <= {nprobe})""")
    ctes.append(f"""scored AS (
      SELECT p.q_id, a.vec_id, {cos('p.qv', 'a.vv')} AS cos
      FROM probes p JOIN af a USING (cid) WHERE p.q_id <> a.vec_id)""")
    return ("WITH " + ",\n".join(ctes) + f"""
    SELECT q_id, vec_id, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cos DESC, vec_id ASC) AS rn
      FROM scored) WHERE rn <= {k}""")


@query("sim_ann_ivf_topk", oracle=_ivf_oracle())
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: coarse-quantizer k-means index + nprobe cluster search —
    the inverted-file scale path (candidates per query = nprobe/nlist of
    the corpus; on a cluster the assignment table is written partitioned
    by cid so probing prunes partitions)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent, assign = SIM.ivf_build(emb, "vec_id", "embedding", nlist=16, n_iter=2)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return SIM.ivf_topk(q, cent, assign, "q_id", "q_vec", "vec_id",
                        k=3, nprobe=2)


# --- portable SimHash (md5-derived bits → fully oracle-paired) ----------

def _simhash_oracle(max_hamming: int = 12) -> str:
    """CTE chain reproducing simhash64_md5 + simhash_band_pairs bit-for-
    bit: md5 hex digits → 64 majority votes → signed-bigint signature →
    4×16-bit band join → exact Hamming verify."""
    digits = ",\n        ".join(
        f"strpos('0123456789abcdef', substring(hx, {i + 1}, 1)) - 1 AS d{i}"
        for i in range(16))
    votes = ",\n        ".join(
        f"SUM(CASE WHEN ((d{b // 4} >> {b % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(64))
    bits = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({(1 << b) if b < 63 else -(1 << 63)} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for b in range(64))
    return f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
    h AS (SELECT doc_id, md5(t) AS hx FROM toks),
    d AS (SELECT doc_id,
        {digits}
      FROM h),
    v AS (SELECT doc_id,
        {votes}
      FROM d GROUP BY doc_id),
    s AS (SELECT doc_id, {bits} AS simhash FROM v),
    bands AS (
      SELECT doc_id, simhash, k.band_idx, (simhash >> (16 * k.band_idx)) & 65535 AS band_key
      FROM s, (VALUES (0), (1), (2), (3)) k(band_idx)),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= {max_hamming}"""


@query("dedup_simhash_pairs", oracle=_simhash_oracle())
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup pairs with the md5-portable signature —
    the SimHash pipeline under full value-hash parity (the xxhash64
    variant stays as the faster JVM-only path, rows-only checked)."""
    d = load_table(spark, sf_dir, "documents")
    sig = DD.simhash64_md5(d, "doc_id", TX.tokens("text"))
    return DD.simhash_band_pairs(sig, "doc_id", max_hamming=12)


# --- end-to-end corpus prep (the 100 TB training-data job in one plan) --

_QUALITY_SQL = f"""
    q AS (
      SELECT doc_id, lang, text,
             len({_TOKS}) AS n_tok
      FROM documents
      WHERE length(text) >= 100 AND len({_TOKS}) >= 20
        AND len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}) >= 0.3
    )"""


def _corpus_prep_oracle(threshold: float = 0.2) -> str:
    """Quality filter → exact dedup (min doc_id per fingerprint) → LSH
    near-dup removal (drop every id_b of a verified pair) → per-language
    doc/token totals. Signatures are computed over the quality SURVIVORS
    (filter-first: at 100 TB the filter drops rows before any shuffle)."""
    jac = ("len(list_intersect(sa.sh, sb.sh)) * 1.0 / "
           "(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))")
    return f"""
    WITH {_QUALITY_SQL},
      sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM q),
      ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
      sig AS (SELECT doc_id, {_duck_minhash_cols(16)} FROM ex GROUP BY doc_id),
      banded AS (
        SELECT doc_id, b.band_idx, b.band_sig FROM sig,
          LATERAL (SELECT * FROM (VALUES
            (0, md5(h0  || '|' || h1  || '|' || h2  || '|' || h3)),
            (1, md5(h4  || '|' || h5  || '|' || h6  || '|' || h7)),
            (2, md5(h8  || '|' || h9  || '|' || h10 || '|' || h11)),
            (3, md5(h12 || '|' || h13 || '|' || h14 || '|' || h15))
          ) v(band_idx, band_sig)) b
      ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
      ), near_drop AS (
        SELECT DISTINCT id_b FROM cand
        JOIN sh sa ON sa.doc_id = id_a
        JOIN sh sb ON sb.doc_id = id_b
        WHERE {jac} >= {threshold}
      ), exact_keep AS (
        SELECT doc_id FROM (
          SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY {_FP}
                                            ORDER BY doc_id) AS rn
          FROM q) WHERE rn = 1
      )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM q
    JOIN exact_keep USING (doc_id)
    WHERE doc_id NOT IN (SELECT id_b FROM near_drop)
    GROUP BY lang"""


@query("corpus_prep_pipeline", oracle=_corpus_prep_oracle())
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data prep job as ONE Catalyst plan: scan-local
    quality filter (drops rows before any shuffle), exact dedup by
    fingerprint window, minhash-LSH near-dup removal over the survivors
    (shared persisted shingle table), per-language corpus totals. Every
    stage is the operator already under the gate individually — this
    proves they compose."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    ttr = F.size(F.array_distinct(toks)) / F.size(toks)
    q = (d.filter((F.length("text") >= 100) & (F.size(toks) >= 20) & (ttr >= 0.3))
          .select("doc_id", "lang", "text", F.size(toks).alias("n_tok")))
    w = Window.partitionBy(TX.fingerprint("text")).orderBy("doc_id")
    exact_keep = (q.withColumn("__rn__", F.row_number().over(w))
                   .filter(F.col("__rn__") == 1).drop("__rn__"))
    near_drop = (DD.near_dup_pairs(q, "doc_id", "text", threshold=0.2)
                 .select(F.col("id_b").alias("doc_id")).distinct())
    kept = exact_keep.join(near_drop, "doc_id", "left_anti")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"))


def _near_dup_pairs_cte(threshold: float = 0.2) -> str:
    """The dedup_lsh_jaccard_pairs oracle as a reusable CTE tail:
    ``pairs(id_a, id_b)`` = verified near-dup pairs."""
    jac = ("len(list_intersect(sa.sh, sb.sh)) * 1.0 / "
           "(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))")
    return f"""{_DUCK_SIG}, banded AS (
      SELECT doc_id, b.band_idx, b.band_sig FROM sig,
        LATERAL (SELECT * FROM (VALUES
          (0, md5(h0  || '|' || h1  || '|' || h2  || '|' || h3)),
          (1, md5(h4  || '|' || h5  || '|' || h6  || '|' || h7)),
          (2, md5(h8  || '|' || h9  || '|' || h10 || '|' || h11)),
          (3, md5(h12 || '|' || h13 || '|' || h14 || '|' || h15))
        ) v(band_idx, band_sig)) b
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    ), pairs AS (
      SELECT id_a, id_b FROM cand
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
      WHERE {jac} >= {threshold}
    )"""


@query(
    "dedup_minhash_estimate",
    oracle=f"""
    WITH {_near_dup_pairs_cte(0.0)}
    SELECT p.id_a, p.id_b,
           ({" + ".join(f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END"
                        for i in range(16))}) / 16.0 AS est_jaccard,
           len(list_intersect(ja.sh, jb.sh)) * 1.0 /
           (len(ja.sh) + len(jb.sh) - len(list_intersect(ja.sh, jb.sh)))
             AS jaccard
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.id_a
    JOIN sig sb ON sb.doc_id = p.id_b
    JOIN sh ja ON ja.doc_id = p.id_a
    JOIN sh jb ON jb.doc_id = p.id_b
    """,
)
def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality audit: MinHash agreement fraction vs exact
    n-gram Jaccard for every band-collided pair. Run before a corpus-scale
    job to validate n_hashes/threshold; both engines compute both numbers
    from the same md5 construction."""
    d = load_table(spark, sf_dir, "documents")
    sh = DD.shingle_table(d, "doc_id", "text").persist()
    sig = DD.minhash_table(d, "doc_id", "text", sh=sh)
    cands = DD.lsh_candidate_pairs(d, "doc_id", "text", sig=sig)
    exact = DD.jaccard_pairs(d, cands, "doc_id", "text",
                             threshold=0.0, sh_rows=sh)
    est = DD.signature_agreement(sig, cands, "doc_id")
    return est.join(exact, ["id_a", "id_b"]).select(
        "id_a", "id_b", "est_jaccard", "jaccard")


@query(
    "dedup_near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_near_dup_pairs_cte(0.2)},
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      WHERE e.dst <> r.src
    )
    SELECT src AS doc_id, least(src, MIN(dst)) AS cluster_id
    FROM reach GROUP BY src
    """,
)
def dedup_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the verified pair
    graph (min-label propagation; the oracle unrolls the same reachability
    with a recursive CTE). cluster_id = the component's minimum doc_id —
    the deterministic canonical representative. This is the principled
    near-dup grouping; `corpus_prep_pipeline` shows the cheaper greedy
    drop-id_b variant."""
    d = load_table(spark, sf_dir, "documents")
    pairs = DD.near_dup_pairs(d, "doc_id", "text", threshold=0.2)
    return (DD.connected_components(pairs)
            .select(F.col("id").alias("doc_id"), "cluster_id"))


@query(
    "dedup_canonical_docs",
    oracle=f"""
    WITH RECURSIVE {_near_dup_pairs_cte(0.2)},
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
    )
    SELECT lang, COUNT(*) AS n_docs
    FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
    GROUP BY lang
    """,
)
def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus after cluster-canonical near-dup removal: keep each
    cluster's min-id member plus all unclustered docs, then per-language
    counts (the audit a data pipeline runs after dedup)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = DD.near_dup_pairs(d, "doc_id", "text", threshold=0.2)
    return (DD.canonical_filter(d, pairs, "doc_id")
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs")))


@query(
    "pack_token_bins",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, len({_TOKS}) AS n_tok FROM documents
    ), c AS (
      SELECT *, COALESCE(SUM(n_tok) OVER (
        PARTITION BY lang ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM t
    )
    SELECT lang, CAST(FLOOR(prev / 2048.0) AS BIGINT) AS bin,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM c GROUP BY 1, 2
    """,
)
def pack_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing audit: per-language 2048-token bins over the
    id-ordered doc stream — docs per bin and token fill. The window
    partitions by shard (lang), so the plan parallelizes across shards
    and the groupBy reuses the window's partitioning."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", F.size(TX.tokens("text")).alias("n_tok"))
    packed = TX.pack_bins(t, "lang", "doc_id", "n_tok", capacity=2048)
    return packed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"))


@query(
    "text_decontamination",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    bench AS (SELECT doc_id AS bench_id, s FROM ex WHERE doc_id < 5)
    SELECT e.doc_id, b.bench_id, COUNT(*) AS n_shared
    FROM ex e JOIN bench b USING (s)
    WHERE e.doc_id <> b.bench_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)
def text_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag corpus docs sharing ≥3 distinct
    3-gram shingles with any benchmark doc (stand-in benchmark: doc_id<5).
    The benchmark shingle set is tiny → broadcast, so the corpus side
    never shuffles: scan → shingle explode → broadcast hash join →
    partial-agg. Shingles are per-doc distinct, so COUNT(*) is the
    distinct overlap count in both engines."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id",
                  F.explode(TX.shingles(TX.tokens("text"))).alias("s"))
    bench = (sh.filter(F.col("doc_id") < 5)
             .select(F.col("doc_id").alias("bench_id"), "s"))
    return (sh.join(F.broadcast(bench), "s")
            .filter(F.col("doc_id") != F.col("bench_id"))
            .groupBy("doc_id", "bench_id")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= 3))


@query(
    "multimodal_resize",
    # fake codec truncates/pads payload to width*height bytes; corpus is
    # pure ASCII so char==byte and chr(0)-rpad reproduces the padding.
    # md5 hex instead of raw bytes: binary cells are driver-unhashable.
    oracle="""
    SELECT doc_id AS id, 'text/plain' AS mime,
           CAST(8 AS INT) AS width, CAST(4 AS INT) AS height,
           md5(rpad(left(text, 32), 32, chr(0))) AS payload_md5
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (Arrow-batched mapInPandas, stubbed codec):
    deterministic fake bytes, verified via md5 of the resized payload."""
    d = load_table(spark, sf_dir, "documents")
    mm = MM.pack(d, "doc_id", "text", "text/plain")
    rs = MM.resize(mm, width=8, height=4, fake=True)
    return rs.select("id", "mime", "width", "height",
                     F.md5("payload").alias("payload_md5"))


@query(
    "multimodal_frame_sample",
    # 1:N fan-out: min(4, max(1, n_bytes//64)) frames of 64 bytes each
    # (last frame may be short — substring matches the python slice).
    oracle="""
    SELECT doc_id AS id, CAST(t.i AS INT) AS frame_idx,
           md5(substring(text, CAST(t.i * 64 + 1 AS INT), 64)) AS frame_md5
    FROM documents, range(0, 4) t(i)
    WHERE t.i < least(4, greatest(len(text) // 64, 1))
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (1:N mapInPandas fan-out, stubbed codec):
    fixed-offset slices, verified via md5 per frame."""
    d = load_table(spark, sf_dir, "documents")
    mm = MM.pack(d, "doc_id", "text", "text/plain")
    fr = MM.frame_sample(mm, every_n_bytes=64, max_frames=4, fake=True)
    return fr.select("id", "frame_idx", F.md5("payload").alias("frame_md5"))


@query(
    "dedup_containment_pairs",
    oracle=f"""
    WITH {_DUCK_SIG}, banded AS (
      SELECT doc_id, b.band_idx, b.band_sig FROM sig,
        LATERAL (SELECT * FROM (VALUES
          (0, md5(h0  || '|' || h1  || '|' || h2  || '|' || h3)),
          (1, md5(h4  || '|' || h5  || '|' || h6  || '|' || h7)),
          (2, md5(h8  || '|' || h9  || '|' || h10 || '|' || h11)),
          (3, md5(h12 || '|' || h13 || '|' || h14 || '|' || h15))
        ) v(band_idx, band_sig)) b
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           len(list_intersect(sa.sh, sb.sh)) * 1.0 / len(sa.sh) AS c_ab,
           len(list_intersect(sa.sh, sb.sh)) * 1.0 / len(sb.sh) AS c_ba
    FROM cand
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0 / len(sa.sh) >= 0.3
       OR len(list_intersect(sa.sh, sb.sh)) * 1.0 / len(sb.sh) >= 0.3
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup (C(A→B) = |A∩B|/|A|): catches
    subset/quote relationships that Jaccard scores near zero — the
    contamination-relevant direction. Same LSH blocking as the Jaccard
    pipeline; both directed containments per candidate pair."""
    d = load_table(spark, sf_dir, "documents")
    return DD.containment_pairs(d, "doc_id", "text", threshold=0.3)


from .registry import ORACLES as _ORACLES_SO_FAR  # noqa: E402


@query("dedup_index_query", oracle=_ORACLES_SO_FAR["dedup_lsh_jaccard_pairs"])
def dedup_index_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-index near-dup path (ext/dedup_index): build the
    signature + shingle tables once, then answer near-dup pairs from the
    derived tables alone — no text rescan. The oracle is byte-identical
    to dedup_lsh_jaccard_pairs' and never sees the index, so a green
    check proves index-path ≡ direct-path ≡ independent SQL. At 100 TB
    this is the nightly-ingest shape: the index is ~1% of corpus size
    and the only thing the candidate join ever shuffles."""
    import os
    import tempfile

    from ..ext import dedup_index as DI

    d = load_table(spark, sf_dir, "documents")
    path = scratch_dir(sf_dir, "dedup_index")
    DI.build_index(d, "doc_id", "text", path)
    return DI.near_dup_pairs_from_index(spark, path, threshold=0.2)

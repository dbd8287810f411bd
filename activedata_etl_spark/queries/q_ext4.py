"""Extension ops round 3b: Gopher-rule quality gating, C4-style
sub-document (chunk-level) cross-corpus dedup.

Oracle strategy: every float metric is an int/int division expressed with
the same operand order on both engines (IEEE division of exactly-
represented integers is deterministic), and every DuckDB integer SUM is
CAST AS BIGINT (HUGEINT is driver-lossy, see parity.compare).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ext import dedup as DD
from ..ext import text as TX
from ..io import load_table, parallelize_narrow_scan
from .registry import query
from .q_ext import _near_dup_pairs_cte

_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"
_STOPS = "[" + ", ".join(f"'{w}'" for w in TX.GOPHER_STOPWORDS) + "]"


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             len(t) AS n_words,
             CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
               / len(t) AS mean_word_len,
             len(list_filter(t, x -> regexp_matches(x, '^[^\\p{{L}}\\p{{N}}]+$')))
               / len(t) AS symbol_ratio,
             len(list_intersect(t, {_STOPS})) AS stop_hits,
             CASE WHEN len(t) - 1 > 0 THEN
               1 - len(list_distinct(g)) / len(g)
             ELSE 0.0 END AS dup_2gram
      FROM (
        SELECT doc_id, {_TOKS} AS t,
               list_transform(range(1, greatest(len({_TOKS}) - 1, 0) + 1),
                              i -> array_to_string(list_slice({_TOKS}, i, i + 1), ' ')) AS g
        FROM documents)
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, stop_hits, dup_2gram,
           (n_words BETWEEN 20 AND 100000)
             AND (mean_word_len BETWEEN 2.0 AND 10.0)
             AND symbol_ratio <= 0.1
             AND stop_hits >= 2
             AND dup_2gram <= 0.85 AS keep
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality gate (Rae et al. 2021 §A1.1): word-count bounds,
    mean word length, symbol-to-word ratio, stopword presence, duplicate-
    2-gram fraction, folded into a keep flag. One scan-local projection —
    at 100 TB this runs inside the ingest scan, before any shuffle, and
    the flag (not the text) is what downstream stages read.

    The local fixture is a single sub-split-size parquet file, so the
    whole HOF projection lands in ONE scan task; parallelize_narrow_scan
    spreads it (r13: bracketed noop 0.29–0.35 → 0.15/0.16 s, rows
    bit-equal) and is a structural no-op at real scale (splits ≫ cores).
    The same wrap measured NEGATIVE for aggregation-headed queries
    (tpch_q18 0.22 → 0.74: it shuffles raw rows the partial agg would
    have collapsed) — only this pure-projection shape qualifies."""
    d = parallelize_narrow_scan(load_table(spark, sf_dir, "documents"))
    return (TX.gopher_table(d, ["doc_id"], "text")
            .withColumn("keep", TX.gopher_keep()))


@query(
    "dedup_chunk_level",
    oracle="""
    WITH t AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok,
             generate_subscripts(string_split_regex(lower(trim(text)), '\\s+'), 1) AS i
      FROM documents
    ), ch AS (
      SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY i)) AS h, COUNT(*) AS n_tok
      FROM t GROUP BY doc_id, floor((i - 1) / 10)
    ), dup AS (
      SELECT h FROM ch GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT ch.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(SUM(CASE WHEN dup.h IS NULL THEN ch.n_tok ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM ch LEFT JOIN dup USING (h)
    GROUP BY ch.doc_id
    """,
)
def dedup_chunk_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document chunk dedup: any 10-token chunk occurring
    in ≥2 documents corpus-wide is boilerplate; report per-doc removal
    stats. Plan: chunks hash scan-local (bodies never shuffle), one
    count-distinct shuffle on uniform md5 keys, dup-set filtered BEFORE
    the join back (AQE broadcasts it when small)."""
    d = load_table(spark, sf_dir, "documents")
    return DD.chunk_dedup_stats(d, "doc_id", "text", chunk=10, min_docs=2)


def _semantic_dedup_oracle(nlist: int = 16, n_iter: int = 2,
                           threshold: float = 0.4) -> str:
    """Oracle for similarity.semantic_dedup: the shared deterministic
    k-means chain (q_ext._ivf_ctes), then per-cluster representative =
    centroid-closest member (ties → lowest id) and the cosine-to-rep
    keep rule."""
    from .q_ext import _ivf_ctes, _sql_cos

    ctes = _ivf_ctes(nlist, n_iter)
    ctes.append(f"""wc AS (
      SELECT a.vec_id, a.vv, a.cid, {_sql_cos('a.vv', 'c.cvec')} AS ccos
      FROM af a JOIN c{n_iter} c USING (cid))""")
    ctes.append("""reps AS (
      SELECT cid, vec_id AS rep_id, vv AS rep_vec FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY cid
                  ORDER BY ccos DESC, vec_id ASC) AS rn
        FROM wc) WHERE rn = 1)""")
    return ("WITH " + ",\n".join(ctes) + f"""
    SELECT w.vec_id, w.cid, r.rep_id,
           {_sql_cos('w.vv', 'r.rep_vec')} AS cos_rep,
           (w.vec_id = r.rep_id)
             OR ({_sql_cos('w.vv', 'r.rep_vec')} < {threshold}) AS keep
    FROM wc w JOIN reps r USING (cid)""")


@query("dedup_semantic_clusters", oracle=_semantic_dedup_oracle())
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space with the
    deterministic IVF k-means, keep one representative per ε-ball around
    each cluster's densest member. Threshold 0.4 suits this synthetic
    near-orthogonal fixture (real embedding corpora use ~0.95+); the
    cos_rep column is value-checked regardless, so the oracle pins the
    full geometry, not just the flags."""
    from ..ext import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.semantic_dedup(emb, "vec_id", "embedding",
                              nlist=16, n_iter=2, threshold=0.4)


@query("dedup_semantic_clusters_auto")
def dedup_semantic_clusters_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_semantic_clusters with ``nlist="auto"`` (~√N clusters, the
    SemDeDup contract): cluster size AND cluster count grow as √N, so
    within-cluster pairwise work scales ~linearly instead of the fixed-k
    ×100 blowup the sf1 rig measured. Rows-only registration (VERDICT
    r8 #6) — nlist depends on a corpus count the SQL oracle can't
    state; the fixed-k twin carries the value oracle, this form makes
    the production-knob adjudication measurable on the rig."""
    from ..ext import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.semantic_dedup(emb, "vec_id", "embedding",
                              nlist="auto", n_iter=2, threshold=0.4)


@query(
    "graph_triangle_cooccurrence",
    oracle="""
    WITH occ AS (
      SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h
      FROM events
    ), e AS (
      SELECT l.user_id AS a, r.user_id AS b, COUNT(*) AS w
      FROM occ l JOIN occ r
        ON l.event_type = r.event_type AND l.h = r.h AND l.user_id < r.user_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ), deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY node
    ), tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
    ), tn AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri) GROUP BY node
    )
    SELECT d.node AS user_id, d.degree,
           COALESCE(tn.n_triangles, 0) AS n_triangles,
           (2.0 * COALESCE(tn.n_triangles, 0)) / (d.degree * (d.degree - 1))
             AS clustering
    FROM deg d LEFT JOIN tn USING (node)
    WHERE d.degree >= 2
    """,
)
def graph_triangle_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community structure of the user co-activity graph: edges between
    users sharing ≥3 distinct (event_type, hour) slots, then per-user
    triangle counts + local clustering coefficient via degree-ordered
    orientation (O(m^1.5), skew-safe — the oracle counts the same
    triangles orientation-free, proving the orientation is lossless)."""
    from ..ext import graph as GR

    ev = (load_table(spark, sf_dir, "events")
          .withColumn("h", F.date_trunc("hour", F.col("ts"))))
    edges = GR.cooccurrence_edges(ev, "user_id", ["event_type", "h"],
                                  min_common=3)
    return (GR.triangle_stats(edges)
            .withColumnRenamed("node", "user_id"))


@query(
    "join_bloom_prefiltered",
    # the bloom stage is result-invisible (no false negatives + exact
    # join downstream), so the oracle is the plain join it reduces
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size = 1
    GROUP BY p.p_brand
    """,
)
def join_bloom_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction: revenue of size-1 parts. The filtered
    part keys build a Bloom filter (constant bytes however many keys);
    lineitem is pre-filtered by it BEFORE any join machinery, then the
    exact join removes the false positives. On a cluster where the dim
    outgrows broadcast, this is the difference between shuffling the
    full fact table and shuffling ~selectivity of it; here the filter
    drops ~98% of lineitem at the scan."""
    from ..functions.exact import dsum
    from ..operators.joins import bloom_prefilter

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 1)
    reduced = bloom_prefilter(li, p.select("p_partkey"),
                              "l_partkey", "p_partkey")
    return (reduced.join(p, reduced.l_partkey == p.p_partkey)
            .groupBy("p_brand")
            .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


@query(
    "corpus_source_overlap",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok,
             generate_subscripts(string_split_regex(lower(trim(text)), '\\s+'), 1) AS i
      FROM documents
    ), ch AS (
      SELECT DISTINCT source, md5(string_agg(tok, ' ' ORDER BY i)) AS h
      FROM t GROUP BY doc_id, source, floor((i - 1) / 10)
    )
    SELECT a.source AS src_a, b.source AS src_b,
           COUNT(DISTINCT a.h) AS n_shared_chunks
    FROM ch a JOIN ch b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how many
    distinct 10-token chunks they share — the governance view that finds
    mirror sites, syndicated boilerplate, and copy-paste feeds BEFORE
    they skew mixture weights. Chunks hash scan-local; the only shuffles
    are the (source, hash) distinct and the hash-keyed self-join (md5
    keys — uniform, skew-free)."""
    d = load_table(spark, sf_dir, "documents")
    ch = (DD.chunk_table(d, "doc_id", "text", chunk=10,
                         extra_cols=("source",))
          .select("source", "h").distinct())
    a = ch.select(F.col("source").alias("src_a"), "h")
    b = ch.select(F.col("source").alias("src_b"), "h")
    return (a.join(b, "h").filter(F.col("src_a") < F.col("src_b"))
            .groupBy("src_a", "src_b")
            .agg(F.countDistinct("h").alias("n_shared_chunks")))


@query(
    "events_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS t1,
             LEAD(event_type, 1) OVER w AS t2,
             LEAD(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1, t2, t3, COUNT(*) AS n
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY t1, t2, t3
    """,
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining: corpus-wide counts of consecutive
    event-type trigrams per user stream (the n-gram view funnels are a
    special case of). One window exchange keyed by user, then an
    ordinary partial-agg'd count — output is bounded by |types|³, not
    the event count."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"))
    return (seq.filter(F.col("t3").isNotNull())
            .groupBy("t1", "t2", "t3").agg(F.count(F.lit(1)).alias("n")))


def _semantic_pairs_oracle(nlist: int = 16, n_iter: int = 2,
                           threshold: float = 0.35) -> str:
    """Within-cluster pairwise ε-ball listing (the O(cluster²) SemDeDup
    refinement): every same-cluster pair above the cosine threshold."""
    from .q_ext import _ivf_ctes, _sql_cos

    ctes = _ivf_ctes(nlist, n_iter)
    return ("WITH " + ",\n".join(ctes) + f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_sql_cos('a.vv', 'b.vv')} AS cos
    FROM af a JOIN af b ON a.cid = b.cid AND a.vec_id < b.vec_id
    WHERE {_sql_cos('a.vv', 'b.vv')} >= {threshold}""")


def _semantic_banded_oracle(nlist: int = 16, n_iter: int = 2,
                            threshold: float = 0.95,
                            n_bits: int = 16, n_bands: int = 4) -> str:
    """The FUSED blocking relation, stated independently: pairs must share
    the k-means cluster AND agree on ≥1 sign-LSH band, cosine ≥ τ — over
    the id-shifted duplicated corpus (random fixture vectors never clear
    τ=0.95 naturally, so the duplicates are the guaranteed signal)."""
    from .q_ext import _ivf_ctes, _sql_cos

    def band_sig(b: int) -> str:
        lo, hi = b * n_bits + 1, (b + 1) * n_bits
        return (f"array_to_string(list_transform(list_slice(vv, {lo}, {hi}),"
                " x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')")

    corpus = ("corpus AS (SELECT vec_id, embedding FROM embeddings"
              " UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings)")
    ctes = [corpus, *_ivf_ctes(nlist, n_iter, source="corpus")]
    values = ",\n          ".join(f"({b}, {band_sig(b)})" for b in range(n_bands))
    ctes.append(f"""bands AS (
      SELECT vec_id, vv, cid, b.band_idx, b.band_sig FROM af,
        LATERAL (SELECT * FROM (VALUES
          {values}
        ) t(band_idx, band_sig)) b)""")
    return ("WITH " + ",\n".join(ctes) + f"""
    SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b,
           {_sql_cos('a.vv', 'c.vv')} AS cos
    FROM bands a JOIN bands c
      ON a.cid = c.cid AND a.band_idx = c.band_idx
     AND a.band_sig = c.band_sig AND a.vec_id < c.vec_id
    WHERE {_sql_cos('a.vv', 'c.vv')} >= {threshold}""")


@query("dedup_semantic_banded_pairs", oracle=_semantic_banded_oracle())
def dedup_semantic_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r3 #4 — ONE operator, both dedup policies: the SemDeDup
    within-cluster ε-ball refinement (dedup_semantic_pairs) fused with
    cosine_dedup_pairs' exact-vector prepass + banded sign-LSH + bucket
    caps, via its ``cluster_col`` hook. Blocking becomes
    (cluster, band, signature): a mega-cluster can no longer go
    cluster² — its members still split across 2^16 band buckets, and
    max_bucket_size caps the residue (SCALE.md 10× rig: pair-bound
    growth). The oracle states the fused relation with no prepass and no
    caps engaged, so a green check proves the plumbing is
    semantics-preserving."""
    from ..ext import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.unionByName(
        emb.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding"))
    _, assign = SIM.ivf_build(corpus, "vec_id", "embedding", nlist=16, n_iter=2)
    return SIM.cosine_dedup_pairs(
        assign.select("vec_id", F.col("__v__").alias("embedding"), "cid"),
        "vec_id", "embedding", threshold=0.95, cluster_col="cid")


@query("dedup_semantic_pairs", oracle=_semantic_pairs_oracle())
def dedup_semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact within-cluster pair listing dedup_semantic_clusters
    anchors away: cluster assignment confines the quadratic to cluster
    size (N²/nlist expected pairwise work instead of N² — with
    nlist ≈ √N that is N^1.5), and the equi-join on cid is a plan
    Catalyst/AQE handles like any LSH bucket join. Threshold 0.35 for
    this near-orthogonal synthetic fixture."""
    from ..ext import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    _, assign = SIM.ivf_build(emb, "vec_id", "embedding", nlist=16, n_iter=2)
    a = assign.select(F.col("vec_id").alias("id_a"), F.col("__v__").alias("va"), "cid")
    b = assign.select(F.col("vec_id").alias("id_b"), F.col("__v__").alias("vb"), "cid")
    return (a.join(b, "cid")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos", SIM.cosine(F.col("va"), F.col("vb")))
            .filter(F.col("cos") >= 0.35)
            .select("id_a", "id_b", "cos"))


@query(
    "text_length_batches",
    oracle="""
    WITH r AS (
      SELECT source, doc_id,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY len(string_split_regex(lower(trim(text)), '\\s+')),
                        doc_id) AS rn
      FROM documents
    )
    SELECT source, CAST(floor((rn - 1) / 8) AS BIGINT) AS batch,
           COUNT(*) AS n_docs, MAX(n_tok) AS max_tok,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
           CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT) AS padding_waste
    FROM r GROUP BY source, floor((rn - 1) / 8)
    """,
)
def text_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit for fixed-shape training batches: sort each
    source's docs by token count, batch in eights, report how many pad
    tokens each batch burns (ext/text.length_batches)."""
    d = load_table(spark, sf_dir, "documents")
    d = d.withColumn("n_tok", TX.token_count("text"))
    return TX.length_batches(d, "source", "doc_id", "n_tok", batch_size=8)


def _bpe_oracle(n_merges: int = 3) -> str:
    """Unrolled CTE chain mirroring text.bpe_merges: weighted vocabulary,
    per-round pair counts, deterministic top pick, leftmost-replace
    merge (replace() semantics probed identical on both engines)."""
    ctes = ["""w AS (
      SELECT w, COUNT(*) AS wf FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
        FROM documents)
      WHERE NOT contains(w, '~') AND length(w) > 0 GROUP BY w)""",
            """s0 AS (
      SELECT array_to_string(string_split_regex(w, ''), '~') AS seq, wf
      FROM w)"""]
    for i in range(1, n_merges + 1):
        ctes.append(f"""p{i} AS (
          SELECT p.lhs AS lhs, p.rhs AS rhs, CAST(SUM(wf) AS BIGINT) AS n
          FROM (
            SELECT unnest(list_transform(
                     range(1, len(string_split(seq, '~'))),
                     j -> struct_pack(lhs := string_split(seq, '~')[j],
                                      rhs := string_split(seq, '~')[j + 1])))
                   AS p, wf
            FROM s{i - 1})
          GROUP BY 1, 2)""")
        ctes.append(f"""t{i} AS (
          SELECT lhs, rhs, n FROM p{i} ORDER BY n DESC, lhs, rhs LIMIT 1)""")
        ctes.append(f"""s{i} AS (
          SELECT replace(seq, lhs || '~' || rhs, lhs || rhs) AS seq, wf
          FROM s{i - 1} CROSS JOIN t{i})""")
    sel = "\nUNION ALL ".join(
        f"SELECT {i} AS merge_rank, lhs, rhs, lhs || rhs AS merged, n FROM t{i}"
        for i in range(1, n_merges + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + sel


@query("text_bpe_merges", oracle=_bpe_oracle())
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 3 BPE merges from the corpus (ext/text.bpe_merges)
    — tokenizer-vocabulary induction as a query. After one corpus scan
    the rounds run over the weighted distinct-word table, so the
    iteration cost is vocabulary-sized at any corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    return TX.bpe_merges(d, "text", n_merges=3)


_HLL_REGS_CTE = """h AS (
      SELECT o_orderstatus, md5(CAST(o_orderkey AS VARCHAR)) AS hx FROM orders
    ), r AS (
      SELECT o_orderstatus,
             (strpos('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16
               + strpos('0123456789abcdef', substring(hx, 2, 1)) - 1 AS bucket,
             list_reduce(list_transform(range(3, 18),
               i -> CAST(strpos('0123456789abcdef', substring(hx, i, 1)) - 1
                         AS BIGINT)),
               (a, b) -> a * 16 + b) AS x
      FROM h
    ), regs AS (
      SELECT o_orderstatus, CAST(bucket AS INT) AS bucket,
             MAX(CASE WHEN x = 0 THEN 61 ELSE 61 - length(bin(x)) END)
               AS max_rho
      FROM r GROUP BY 1, 2
    )"""


@query(
    "agg_hll_registers",
    oracle=f"WITH {_HLL_REGS_CTE}\n    SELECT * FROM regs",
)
def agg_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The portable-HLL register table itself (functions/hll.py): md5
    bucket + leading-zero rank, per order status. Every register is
    value-checked against the oracle's independent reconstruction —
    this is the persistable, mergeable NDV-index state, not a black-box
    sketch blob."""
    from ..functions import hll

    o = load_table(spark, sf_dir, "orders")
    return hll.hll_registers(o, ["o_orderstatus"], "o_orderkey")


@query(
    "agg_hll_estimate",
    oracle=f"""
    WITH {_HLL_REGS_CTE},
    hsum AS (
      SELECT n_buckets,
             present_sum + (256 - n_buckets)
               * CAST((CAST(1 AS BIGINT) << 61) AS DECIMAL(38,0)) AS harmonic
      FROM (SELECT COUNT(*) AS n_buckets,
                   SUM(CAST((CAST(1 AS BIGINT) << (61 - max_rho)) AS DECIMAL(38,0)))
                     AS present_sum
            FROM (SELECT DISTINCT bucket, MAX(max_rho) OVER
                    (PARTITION BY bucket) AS max_rho FROM regs))
    )
    SELECT n_buckets, CAST(256 - n_buckets AS BIGINT) AS n_zero,
           CAST(harmonic AS VARCHAR) AS harmonic_scaled,
           1.0854228543761655e+23 / CAST(CAST(harmonic AS VARCHAR) AS DOUBLE) AS raw_est,
           (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS exact_ndv,
           abs(1.0854228543761655e+23 / CAST(CAST(harmonic AS VARCHAR) AS DOUBLE)
               - (SELECT COUNT(DISTINCT o_orderkey) FROM orders))
             / (SELECT COUNT(DISTINCT o_orderkey) FROM orders) < 0.15
             AS within_tolerance
    FROM hsum
    """,
)
def agg_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NDV estimate from the merged register table, with the
    exact count and a tolerance flag in the same row — the sketch audit
    pattern, but over a sketch whose every intermediate the oracle
    recomputes. Merging the per-status registers first (max per bucket)
    exercises the shard-merge path the persisted index relies on."""
    from ..functions import hll

    o = load_table(spark, sf_dir, "orders")
    regs = hll.hll_registers(o, ["o_orderstatus"], "o_orderkey")
    merged = hll.hll_merge(regs, group_cols=[])
    est = hll.hll_estimate(merged, [])
    exact = o.agg(F.countDistinct("o_orderkey").alias("exact_ndv"))
    return (est.crossJoin(F.broadcast(exact))
            .withColumn("within_tolerance",
                        F.abs(F.col("raw_est") - F.col("exact_ndv"))
                        / F.col("exact_ndv") < 0.15))


@query(
    "window_rolling_distinct",
    oracle="""
    SELECT event_id, event_type,
           len(list_distinct(list(user_id) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 199 PRECEDING AND CURRENT ROW))) AS n_active
    FROM events
    """,
)
def window_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling active-entity count: distinct users among the trailing
    200 events of each type — the 'active users right now' series SQL
    windows can't express with COUNT(DISTINCT ... OVER). The frame is
    bounded (200 rows) so the per-row set materialization is O(200);
    unbounded running distincts belong to a groupBy-then-join plan, not
    a window."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("event_type").orderBy("ts", "event_id")
         .rowsBetween(-199, 0))
    return e.select(
        "event_id", "event_type",
        F.size(F.array_distinct(F.collect_list("user_id").over(w)))
         .alias("n_active"))


@query(
    "etl_snapshot_diff",
    # synthetic snapshots from the fixture: "yesterday" misses keys
    # divisible by 97 and carries a stale price for keys divisible by 89
    oracle="""
    WITH old AS (
      SELECT o_orderkey,
             md5(CAST(CASE WHEN o_orderkey % 89 = 0
                           THEN o_totalprice + 1
                           ELSE o_totalprice END AS VARCHAR)
                 || '|' || o_orderstatus) AS fp
      FROM orders WHERE o_orderkey % 97 <> 0
    ), new AS (
      SELECT o_orderkey,
             md5(CAST(o_totalprice AS VARCHAR) || '|' || o_orderstatus) AS fp
      FROM orders
    )
    SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.fp IS NULL THEN 'added'
                WHEN new.fp IS NULL THEN 'removed'
                WHEN old.fp <> new.fp THEN 'changed' END AS change
    FROM old FULL OUTER JOIN new USING (o_orderkey)
    WHERE (old.fp IS NULL) OR (new.fp IS NULL) OR (old.fp <> new.fp)
    """,
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot CDC (sources/etl.snapshot_diff): keys+hashes
    only cross the shuffle, bodies never move. Synthetic 'yesterday'
    derived deterministically from the fixture so added/removed/changed
    all occur."""
    from ..sources.etl import snapshot_diff

    o = load_table(spark, sf_dir, "orders")
    old = (o.filter(F.col("o_orderkey") % 97 != 0)
           .withColumn("o_totalprice",
                       F.when(F.col("o_orderkey") % 89 == 0,
                              F.col("o_totalprice") + 1)
                       .otherwise(F.col("o_totalprice"))))
    return snapshot_diff(old, o, ["o_orderkey"],
                         ["o_totalprice", "o_orderstatus"])


@query(
    "etl_dq_audit",
    oracle="""
    SELECT 'orders_pk_duplicates' AS check_name,
           COUNT(*) - COUNT(DISTINCT o_orderkey) AS n FROM orders
    UNION ALL
    SELECT 'lineitem_fk_orphans',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders_nonpositive_price',
           (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
    UNION ALL
    SELECT 'lineitem_nonpositive_quantity',
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
    UNION ALL
    SELECT 'events_user_not_in_customer',
           (SELECT COUNT(*) FROM events e
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = e.user_id))
    """,
)
def etl_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline data-quality audit in one result set: primary-key
    uniqueness, referential integrity (anti joins — broadcast when the
    dim fits, shuffle-hash otherwise), domain constraints, and a
    cross-dataset membership probe. Each check is a partial-agg'd count;
    union of 5 one-row frames."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")

    def row(name, df_count):
        return df_count.select(F.lit(name).alias("check_name"),
                               F.col("n").cast("bigint").alias("n"))

    checks = [
        row("orders_pk_duplicates",
            o.agg((F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n"))),
        row("lineitem_fk_orphans",
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
              .agg(F.count(F.lit(1)).alias("n"))),
        row("orders_nonpositive_price",
            o.filter(F.col("o_totalprice") <= 0).agg(F.count(F.lit(1)).alias("n"))),
        row("lineitem_nonpositive_quantity",
            li.filter(F.col("l_quantity") <= 0)
              .agg(F.count(F.lit(1)).alias("n"))),
        row("events_user_not_in_customer",
            e.join(c, e.user_id == c.c_custkey, "left_anti")
              .agg(F.count(F.lit(1)).alias("n"))),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out


@query(
    "agg_winsorize",
    oracle="""
    WITH p AS (
      SELECT event_type,
             percentile_cont(0.05) WITHIN GROUP (ORDER BY value) AS lo,
             percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS hi
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           least(greatest(e.value, p.lo), p.hi) AS v_wins
    FROM events e JOIN p USING (event_type)
    """,
)
def agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier clipping at exact per-group percentiles (the robust
    alternative to dropping tails): bracket-pruned exact p05/p95 per
    event type (no per-group sort), broadcast back, clip map-side.
    The clipped doubles hash exactly because the percentile machinery
    reproduces percentile_cont interpolation bit-for-bit."""
    from ..functions import aggs as A

    e = load_table(spark, sf_dir, "events")
    p = A.pruned_percentiles(e, ["event_type"], "value",
                             {"lo": 0.05, "hi": 0.95})
    return (e.join(F.broadcast(p), "event_type")
            .select("event_id", "event_type",
                    F.least(F.greatest(F.col("value"), F.col("lo")),
                            F.col("hi")).alias("v_wins")))


@query(
    "agg_equidepth_histogram",
    # bucket rule stated identically on both engines: 1 + count of
    # interior percentile_cont boundaries strictly below the value —
    # NOT NTILE, which needs a global sort (single task at scale)
    oracle="""
    WITH b AS (
      SELECT """ + ",\n             ".join(
        f"percentile_cont({i / 8}) WITHIN GROUP "
        f"(ORDER BY CAST(l_extendedprice AS DOUBLE)) AS b{i}"
        for i in range(1, 8)) + """
      FROM lineitem
    )
    SELECT 1 """ + " ".join(
        f"+ CASE WHEN CAST(l_extendedprice AS DOUBLE) > b{i} "
        "THEN 1 ELSE 0 END" for i in range(1, 8)) + """ AS bucket,
           COUNT(*) AS n,
           MIN(CAST(l_extendedprice AS DOUBLE)) AS lo,
           MAX(CAST(l_extendedprice AS DOUBLE)) AS hi
    FROM lineitem CROSS JOIN b
    GROUP BY 1
    """,
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-boundary) histogram without the global sort
    NTILE needs: 7 exact interior boundaries via the bracket-pruned
    percentile path (tiny result, broadcast), bucket assignment as 7
    scan-local comparisons, one partial-agg'd groupBy. The classic
    optimizer-statistics / data-profiling primitive at any scale."""
    from ..functions import aggs as A

    li = load_table(spark, sf_dir, "lineitem")
    v = F.col("l_extendedprice").cast("double")
    bnd = A.pruned_percentiles(li, [], "l_extendedprice",
                               {f"b{i}": i / 8 for i in range(1, 8)})
    bucket = F.lit(1)
    for i in range(1, 8):
        bucket = bucket + F.when(v > F.col(f"b{i}"), 1).otherwise(0)
    return (li.crossJoin(F.broadcast(bnd))
            .select(bucket.alias("bucket"), v.alias("v"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("v").alias("lo"), F.max("v").alias("hi")))


@query(
    "sample_mixture_budget",
    oracle="""
    WITH t AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(lower(trim(text)), '\\s+')))
                  AS BIGINT) AS n_tokens,
             CAST(substring(source, 4) AS INT) % 5 + 1 AS wn
      FROM documents GROUP BY source
    ), s AS (SELECT CAST(SUM(wn) AS BIGINT) AS wsum FROM t)
    SELECT source, n_tokens, wn,
           CAST(50000 * wn AS BIGINT) // wsum AS target_tokens,
           CAST(least(CAST(50000 * wn AS BIGINT) // wsum, n_tokens) AS DOUBLE)
             / n_tokens AS keep_rate,
           greatest(CAST(50000 * wn AS BIGINT) // wsum - n_tokens, 0)
             AS shortfall
    FROM t CROSS JOIN s
    """,
)
def sample_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planning: supply per source, integer target
    allocation (bigint DIV — engine-exact), keep rate and shortfall per
    source. The output feeds sampling.weighted_mixture, which applies
    the rates as a scan-local hash filter. Source weights derive
    deterministically from the source id (1..5 cycle)."""
    from ..ext import sampling as S

    d = load_table(spark, sf_dir, "documents")
    d = d.withColumn("n_tok", TX.token_count("text")) \
         .withColumn("wn", F.substring("source", 4, 10).cast("int") % 5 + 1)
    return S.mixture_budget(d, "source", "n_tok", "wn", budget=50_000)


@query(
    "corpus_curriculum_order",
    # quality = type-token ratio quartile via exact boundaries; order =
    # quartile (easy→hard ≙ high→low TTR), then md5-rank within quartile
    oracle="""
    WITH q AS (
      SELECT doc_id,
             len(list_distinct(string_split_regex(lower(trim(text)), '\\s+')))
               * 1.0 / len(string_split_regex(lower(trim(text)), '\\s+')) AS ttr
      FROM documents
    ), b AS (
      SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY ttr) AS b1,
             percentile_cont(0.5)  WITHIN GROUP (ORDER BY ttr) AS b2,
             percentile_cont(0.75) WITHIN GROUP (ORDER BY ttr) AS b3
      FROM q
    )
    SELECT doc_id, stage, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY stage, shard
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
    FROM (
      SELECT doc_id,
             4 - (CASE WHEN ttr > b1 THEN 1 ELSE 0 END
                  + CASE WHEN ttr > b2 THEN 1 ELSE 0 END
                  + CASE WHEN ttr > b3 THEN 1 ELSE 0 END) AS stage,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 8 AS shard
      FROM q CROSS JOIN b)
    """,
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: quality quartile (stage 1 = highest
    type-token ratio) as the coarse phase, deterministic md5 rank as the
    within-stage shuffle — easy-to-hard scheduling that is reproducible
    across engines, retries, and input layout. Boundaries from the
    exact-percentile path (broadcast). Ranking partitions by
    (stage, shard) with a hash shard — parallelism is stages x shards,
    never a per-stage global sort (the global_shuffle design); a reader
    walks stages in order, shards within a stage in any order. At
    100 TB the same plan writes partitionBy(stage, shard) +
    sortWithinPartitions(pos)."""
    from pyspark.sql import Window
    from ..functions import aggs as A

    d = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    q = d.select("doc_id",
                 (F.size(F.array_distinct(toks)) / F.size(toks)).alias("ttr"))
    b = A.pruned_percentiles(q, [], "ttr", {"b1": 0.25, "b2": 0.5, "b3": 0.75})
    staged = (q.crossJoin(F.broadcast(b))
              .withColumn("stage",
                          4 - (F.when(F.col("ttr") > F.col("b1"), 1).otherwise(0)
                               + F.when(F.col("ttr") > F.col("b2"), 1).otherwise(0)
                               + F.when(F.col("ttr") > F.col("b3"), 1).otherwise(0))))
    from ..ext.sampling import hash_bucket

    staged = staged.withColumn(
        "shard", F.pmod(hash_bucket(F.col("doc_id")), F.lit(8)).cast("int"))
    w = Window.partitionBy("stage", "shard").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return staged.select("doc_id", "stage", "shard",
                         F.row_number().over(w).cast("bigint").alias("pos"))


@query(
    "events_session_features",
    oracle="""
    WITH flagged AS (
      SELECT event_id, user_id, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                       OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT event_id, user_id, ts,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT event_id, user_id, session_no,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id, session_no
                                   ORDER BY ts, event_id) AS BIGINT)
             AS event_in_session,
           CAST(date_diff('second',
                MIN(ts) OVER (PARTITION BY user_id, session_no), ts)
             AS BIGINT) AS secs_into_session
    FROM numbered
    """,
)
def events_session_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-relative enrichment: each event's session ordinal and
    seconds-since-session-start — the features behind dwell-time and
    journey-position models. One window family keyed (user) for the
    lag+cumsum session ids, then (user, session) windows; both exchanges
    hash-partition on keys the data already groups by."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(wu)
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(wu.rowsBetween(Window.unboundedPreceding, 0))
         .cast("bigint"))
    ws = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    return numbered.select(
        "event_id", "user_id", "session_no",
        F.row_number().over(ws).cast("bigint").alias("event_in_session"),
        (F.col("ts").cast("long")
         - F.min(F.col("ts").cast("long")).over(
             Window.partitionBy("user_id", "session_no")))
        .cast("bigint").alias("secs_into_session"))


@query(
    "agg_contingency_chi2",
    # per-CELL chi-square contributions: no cross-cell float sum exists,
    # so every double is one identical arithmetic chain on both engines
    oracle="""
    WITH o AS (
      SELECT source, lang, COUNT(*) AS observed FROM documents GROUP BY 1, 2
    ), r AS (SELECT source, CAST(SUM(observed) AS BIGINT) AS row_n FROM o GROUP BY 1),
    c AS (SELECT lang, CAST(SUM(observed) AS BIGINT) AS col_n FROM o GROUP BY 1),
    n AS (SELECT CAST(SUM(observed) AS BIGINT) AS total FROM o)
    SELECT o.source, o.lang, o.observed,
           CAST(r.row_n * c.col_n AS DOUBLE) / total AS expected,
           (o.observed - CAST(r.row_n * c.col_n AS DOUBLE) / total)
             * (o.observed - CAST(r.row_n * c.col_n AS DOUBLE) / total)
             / (CAST(r.row_n * c.col_n AS DOUBLE) / total) AS cell_chi2
    FROM o JOIN r USING (source) JOIN c USING (lang) CROSS JOIN n
    """,
)
def agg_contingency_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independence audit of the source × language contingency table:
    observed counts, expected under independence, and each cell's χ²
    contribution — the dataset-balance check run before mixture
    reweighting. Integer marginals broadcast; every float is the same
    operand-order expression on both engines, so cells hash exactly
    (the total χ² is the consumer's sum — a cross-cell float sum would
    be the one order-dependent step, so it stays out of the output)."""
    d = load_table(spark, sf_dir, "documents")
    o = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("observed"))
    r = o.groupBy("source").agg(F.sum("observed").cast("bigint").alias("row_n"))
    c = o.groupBy("lang").agg(F.sum("observed").cast("bigint").alias("col_n"))
    n = o.agg(F.sum("observed").cast("bigint").alias("total"))
    e = (F.col("row_n") * F.col("col_n")).cast("double") / F.col("total")
    return (o.join(F.broadcast(r), "source").join(F.broadcast(c), "lang")
            .crossJoin(F.broadcast(n))
            .select("source", "lang", "observed", e.alias("expected"),
                    ((F.col("observed") - e) * (F.col("observed") - e) / e)
                    .alias("cell_chi2")))


@query(
    "agg_ratio_to_report",
    oracle="""
    WITH per AS (
      SELECT n.n_name,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS rev
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name, CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE)
             / CAST((SELECT SUM(rev) FROM per) AS DOUBLE) AS share
    FROM per
    """,
)
def agg_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total contribution (the ratio_to_report shape):
    supplier-nation revenue share. Both the numerator and the global
    denominator are exact decimal sums (order-free), so even the float
    shares hash identically; the one-row total broadcasts back."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) \
        .cast("decimal(18,6)")
    per = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
           .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
           .groupBy("n_name")
           .agg(F.sum(rev).cast("decimal(38,6)").alias("rev")))
    tot = per.agg(F.sum("rev").alias("tot"))
    return (per.crossJoin(F.broadcast(tot))
            .select("n_name", F.col("rev").cast("double").alias("revenue"),
                    (F.col("rev").cast("double")
                     / F.col("tot").cast("double")).alias("share")))


@query(
    "dedup_keep_best_quality",
    oracle="""
    WITH RECURSIVE """ + _near_dup_pairs_cte(0.2) + """,
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
    scored AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
             len(string_split_regex(lower(trim(d.text)), '\\s+')) AS n_tok
      FROM documents d LEFT JOIN comp c USING (doc_id)
    )
    SELECT cluster_id, doc_id AS kept_doc, n_tok AS kept_tokens,
           CAST(n_members AS BIGINT) AS n_members
    FROM (
      SELECT *, COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY n_tok DESC, doc_id ASC) AS rn
      FROM scored) WHERE rn = 1
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup removal with a QUALITY policy: within each connected
    near-dup cluster keep the highest-token-count member (ties → lowest
    id), not the arbitrary min-id — the canonicalization real corpora
    want (the longest variant usually carries the most content).
    Clusters from the same min-label propagation the clusters query
    uses; the policy is one max_by per cluster."""
    d = load_table(spark, sf_dir, "documents")
    pairs = DD.near_dup_pairs(d, "doc_id", "text", threshold=0.2)
    comp = DD.connected_components(pairs) \
        .select(F.col("id").alias("doc_id"), "cluster_id")
    scored = (d.select("doc_id", TX.token_count("text").alias("n_tok"))
              .join(comp, "doc_id", "left")
              .withColumn("cluster_id",
                          F.coalesce("cluster_id", F.col("doc_id"))))
    return (scored.groupBy("cluster_id")
            .agg(F.max_by(F.struct(F.col("doc_id").alias("kept_doc"),
                                   F.col("n_tok").alias("kept_tokens")),
                          F.struct(F.col("n_tok"), -F.col("doc_id")))
                 .alias("best"),
                 F.count(F.lit(1)).cast("bigint").alias("n_members"))
            .select("cluster_id", "best.kept_doc", "best.kept_tokens",
                    "n_members"))


@query(
    "agg_listagg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS members,
           COUNT(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered LISTAGG/string_agg: per-group member roster with an
    EXPLICIT order (collect_list order is partition-dependent — the
    determinism rule every first/last/collect in this repo follows).
    array_join(array_sort(collect_list)) reproduces string_agg ...
    ORDER BY exactly."""
    n = load_table(spark, sf_dir, "nation")
    return (n.groupBy("n_regionkey")
            .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",")
                 .alias("members"),
                 F.count(F.lit(1)).alias("n")))

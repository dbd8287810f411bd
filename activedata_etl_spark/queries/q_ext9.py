"""Round-6 continuation queries: the EXACT set-similarity join class
(prefix filtering — AllPairs/PPJoin) and histogram-exact robust means.

Prefix filtering is the deterministic complement to the MinHash-LSH
family: recall = 1.0 by lemma, candidate volume bounded by element
rarity instead of band width. Its oracle is the strongest form in the
registry — a blind all-pairs Jaccard scan with no knowledge of the
filter, so a hash-match PROVES the prefix join dropped nothing. The
recall-audit query then uses that exact pair set as ground truth to
measure the probabilistic family's recall — the calibration report a
corpus owner reads before picking band parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ext import dedup as DD
from ..functions import aggs as AGG
from ..io import load_table
from .registry import ensure_built, query, scratch_dir
from .q_ext import _SHINGLES

#: EXHAUSTIVE exact shingle-Jaccard CTE chain (the blind ground truth):
#: intersection counts via the inverted (doc, shingle) self-join — any
#: pair with J > 0 shares a shingle, so grouping the join by pair loses
#: nothing, and the counts equal len(list_intersect) on distinct sets.
#: Still blind to the prefix filter (no rarest-first order, no prefix,
#: no positional bound anywhere); 25x faster than the quadratic
#: list_intersect scan at sf0.1 (20s vs 490s, same 256 pairs), which
#: keeps deep sweeps affordable.
_EXACT_PAIRS = f"""t AS (
      SELECT doc_id, {_SHINGLES} AS s
      FROM documents
    ), sz AS (SELECT doc_id, len(s) AS n FROM t WHERE len(s) > 0),
    ex0 AS (SELECT doc_id, unnest(s) AS s FROM t),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(COUNT(*) AS BIGINT) AS i
      FROM ex0 a JOIN ex0 b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT id_a, id_b, i * 1.0 / (sa.n + sb.n - i) AS jaccard
      FROM inter
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
    )"""


@query(
    "dedup_prefix_filter_pairs",
    oracle=f"""
    WITH {_EXACT_PAIRS}
    SELECT id_a, id_b, jaccard FROM exact
    """,
)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard >= 0.5 pairs via prefix filtering
    (ext/dedup.prefix_filter_pairs): rarest-first global element order,
    per-doc prefix of length n - ceil(t*n) + 1, prefix-to-prefix
    equi-join + size-band + PPJoin positional filter, long-form exact
    verify. The oracle is
    a blind all-pairs scan — a value match proves recall = 1.0 on this
    corpus, not just on the pairs the filter happened to generate."""
    d = load_table(spark, sf_dir, "documents")
    return DD.prefix_filter_pairs(d, "doc_id", "text", threshold=0.5)


@query(
    "dedup_prefix_blocking_audit",
    oracle=f"""
    WITH {_EXACT_PAIRS},
    tok AS (SELECT DISTINCT doc_id, unnest(s) AS s FROM t),
    szs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM tok GROUP BY 1),
    dfq AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY 1),
    pos AS (
      SELECT tok.doc_id, tok.s, dfq.df, szs.n,
             ROW_NUMBER() OVER (PARTITION BY tok.doc_id
                                ORDER BY dfq.df ASC, tok.s ASC) AS pos
      FROM tok JOIN dfq USING (s) JOIN szs USING (doc_id)
    ),
    pref AS (SELECT * FROM pos
             WHERE pos <= n - CEIL(n * 0.5 - 1e-9) + 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pref a JOIN pref b
        ON a.s = b.s AND a.doc_id < b.doc_id
       AND b.n >= CEIL(a.n * 0.5 - 1e-9)
       AND b.n * 0.5 - 1e-9 <= a.n
       AND LEAST(a.n - a.pos, b.n - b.pos) + 1
           >= CEIL((a.n + b.n)
                   * (CAST(0.5 AS DOUBLE) / CAST(1.5 AS DOUBLE)) - 1e-9)
    ),
    cand_agg AS (
      -- PPJoin+-flavored AGGREGATE pair bound: o <= c + LEAST(n_a -
      -- pa_max, n_b - pb_max); c counts ALL shared prefix rows (no
      -- per-row positional drop — that would undercount c), and the
      -- max positions both come from the order-largest shared
      -- both-prefix element because the global order sorts both docs
      -- identically
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pref a JOIN pref b
        ON a.s = b.s AND a.doc_id < b.doc_id
       AND b.n >= CEIL(a.n * 0.5 - 1e-9)
       AND b.n * 0.5 - 1e-9 <= a.n
      GROUP BY 1, 2
      HAVING CAST(COUNT(*) AS BIGINT)
             + LEAST(MAX(a.n) - MAX(a.pos), MAX(b.n) - MAX(b.pos))
             >= CEIL((MAX(a.n) + MAX(b.n))
                     * (CAST(0.5 AS DOUBLE) / CAST(1.5 AS DOUBLE)) - 1e-9)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_agg)
             AS n_candidates_aggregate,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) AS n_pairs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) * 1.0
             / (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS precision,
           1.0 - (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_agg) * 1.0
             / (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)
             AS aggregate_reduction,
           (SELECT CAST(MAX(df) AS BIGINT) FROM pref) AS max_prefix_df
    """,
)
def dedup_prefix_blocking_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prefix join's blocking report: candidate volume, verified-pair
    volume, blocking precision, and the worst-case join bucket (max
    document frequency among PREFIX elements — SCALE.md's inspectable
    skew bound, readable before the join runs). The oracle mirrors the
    candidate stage expression-for-expression (same rarest-first order,
    same relaxed ceils) and takes the verified count from the BLIND
    all-pairs scan — equal by the recall lemma, so this query
    value-checks the blocking stage the pairs query treats as opaque.

    r7 (VERDICT r6 #6): the row also compares the per-row POSITIONAL
    bound against the PPJoin+-flavored AGGREGATE pair bound
    (n_candidates_aggregate / aggregate_reduction, both sides mirrored
    in the oracle). Measured at sf0.1: 124,979 → 119,907 candidates,
    a 4.1% further reduction — well under the 20% keep-bar, so
    "positional" stays the default and the aggregate bound lives
    behind the pair_bound flag; this audit keeps the decision
    data-driven as the corpus changes."""
    d = load_table(spark, sf_dir, "documents")
    cand, cand_agg, tok, pref = DD.prefix_candidate_bounds(
        d, "doc_id", "text", threshold=0.5)
    ver = DD.jaccard_pairs_counts(cand, tok, "__id__", threshold=0.5)
    n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    n_agg = cand_agg.agg(F.count(F.lit(1)).cast("bigint")
                         .alias("n_candidates_aggregate"))
    n_pairs = ver.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    worst = pref.agg(F.max("__df__").cast("bigint").alias("max_prefix_df"))
    return DD._materialize_release(
        n_cand.crossJoin(F.broadcast(n_agg))
        .crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(worst))
        .select("n_candidates", "n_candidates_aggregate", "n_pairs",
                (F.col("n_pairs") * F.lit(1.0)
                 / F.col("n_candidates")).alias("precision"),
                (F.lit(1.0) - F.col("n_candidates_aggregate") * F.lit(1.0)
                 / F.col("n_candidates")).alias("aggregate_reduction"),
                "max_prefix_df"),
        tok, pref)


@query(
    "dedup_lsh_scurve_report",
    oracle=f"""
    WITH {_EXACT_PAIRS},
    sh2 AS (SELECT doc_id, s AS sh FROM t),
    ex2 AS (SELECT doc_id, unnest(sh) AS s FROM sh2),
    sig AS (SELECT doc_id,
        {", ".join(f"min(md5('{i}:' || s)) AS h{i}" for i in range(16))}
      FROM ex2 GROUP BY doc_id),
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
    ), curve AS (
      SELECT e.id_a, e.id_b, e.jaccard,
             1 - ((1 - (e.jaccard * e.jaccard) * (e.jaccard * e.jaccard))
                  * (1 - (e.jaccard * e.jaccard) * (e.jaccard * e.jaccard)))
               * ((1 - (e.jaccard * e.jaccard) * (e.jaccard * e.jaccard))
                  * (1 - (e.jaccard * e.jaccard) * (e.jaccard * e.jaccard)))
               AS p_collide,
             c.id_a IS NOT NULL AS hit
      FROM exact e LEFT JOIN cand c
        ON e.id_a = c.id_a AND e.id_b = c.id_b
    )
    SELECT id_a, id_b, jaccard, p_collide, hit FROM curve
    """,
)
def dedup_lsh_scurve_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The s-curve calibration report for the banded MinHash config:
    every TRUE pair (exact prefix-filter ground truth, recall 1.0) with
    its theoretical collision probability under the registered
    16-hash/4-band layout — p = 1-(1-s^r)^b with r=b=4 — and whether the
    LSH candidate stage actually produced it. This is the table a corpus
    owner reads to pick band parameters: theory and measurement in the
    same row, per pair. p is computed by REPEATED MULTIPLICATION
    (s2=s*s, s4=s2*s2, q=1-s4, p=1-(q*q)*(q*q)) — plain IEEE ops that
    both engines execute identically, unlike pow() whose libm vs JVM
    results can differ by 1 ulp; no sums anywhere, so every value is
    per-row exact."""
    d = load_table(spark, sf_dir, "documents")
    exact = DD.prefix_filter_pairs(d, "doc_id", "text", threshold=0.5)
    cand = DD.lsh_candidate_pairs(d, "doc_id", "text")
    j = F.col("jaccard")
    s4 = (j * j) * (j * j)
    q = F.lit(1) - s4
    p = F.lit(1) - (q * q) * (q * q)
    return (exact.join(cand.withColumn("__hit__", F.lit(1)),
                       ["id_a", "id_b"], "left")
            .select("id_a", "id_b", "jaccard", p.alias("p_collide"),
                    F.col("__hit__").isNotNull().alias("hit")))


@query(
    "agg_trimmed_mean",
    oracle="""
    WITH h AS (
      SELECT l_returnflag, l_quantity AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ), w AS (
      SELECT l_returnflag, v, c,
             CAST(COALESCE(SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cb,
             CAST(SUM(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      FROM h
    ), p AS (
      SELECT *, CAST(FLOOR(0.1 * n) AS BIGINT) AS k FROM w
    ), q AS (
      SELECT *,
             GREATEST(CAST(0 AS BIGINT),
                      LEAST(cb + c, n - k) - GREATEST(cb, k)) AS kept,
             CASE WHEN cb <= k AND k < cb + c THEN v END AS lo_hit,
             CASE WHEN cb < n - k AND n - k <= cb + c THEN v END AS hi_hit
      FROM p
    )
    SELECT l_returnflag, MAX(n) AS n, MAX(k) AS k,
           CAST(SUM(v * c) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS mean,
           CAST(SUM(v * kept) AS DOUBLE)
             / CAST(MAX(n) - 2 * MAX(k) AS DOUBLE) AS trimmed_mean,
           CAST(SUM(v * kept) + MAX(k) * MAX(lo_hit)
                + MAX(k) * MAX(hi_hit) AS DOUBLE)
             / CAST(MAX(n) AS DOUBLE) AS winsorized_mean
    FROM q GROUP BY 1 ORDER BY 1
    """,
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10%-trimmed and winsorized mean of l_quantity per return
    flag via the value histogram (functions/aggs.trimmed_means_histogram)
    — rank clipping on one row per distinct value, no per-row window
    sort; the robust-mean sibling of the histogram percentile strategy.
    l_quantity is integer-valued, so every product/sum is exact and the
    doubles hash-match the serial oracle bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    return AGG.trimmed_means_histogram(
        li, ["l_returnflag"], "l_quantity", trim=0.1)


# jx front-end routes (result-invisible: same oracles as the direct
# paths), following the q_sketches pattern.
from ..plans import query as JXP  # noqa: E402
from .registry import ORACLES as _REG  # noqa: E402


def _run_jx(spark: SparkSession, sf_dir: str, q: dict) -> DataFrame:
    from ..io import register_views

    register_views(spark, sf_dir)
    return JXP.run(spark, q)


@query("jx_prefix_filter_pairs", oracle=_REG["dedup_prefix_filter_pairs"])
def jx_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact prefix-filter join through the jx JSON front-end
    (plans/extensions.py op "prefix_filter_pairs")."""
    return _run_jx(spark, sf_dir, {
        "from": {"op": "prefix_filter_pairs", "table": "documents",
                 "threshold": 0.5},
    })


@query("jx_trimmed_mean", oracle=_REG["agg_trimmed_mean"])
def jx_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram robust means through the jx front-end (op
    "trimmed_means"), same oracle as the direct path."""
    return _run_jx(spark, sf_dir, {
        "from": {"op": "trimmed_means", "table": "lineitem",
                 "group": "l_returnflag", "value": "l_quantity",
                 "trim": 0.1},
    })


@query(
    "agg_spearman_corr",
    oracle="""
    WITH d AS (
      SELECT l_returnflag AS g, l_quantity AS x, l_extendedprice AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    ), r AS (
      SELECT g,
             2 * RANK() OVER (PARTITION BY g ORDER BY x)
               + COUNT(*) OVER (PARTITION BY g, x) - 1 AS rx,
             2 * RANK() OVER (PARTITION BY g ORDER BY y)
               + COUNT(*) OVER (PARTITION BY g, y) - 1 AS ry
      FROM d
    ), s AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rx) AS BIGINT) AS sx,
             CAST(SUM(ry) AS BIGINT) AS sy,
             CAST(SUM(rx * rx) AS BIGINT) AS sxx,
             CAST(SUM(ry * ry) AS BIGINT) AS syy,
             CAST(SUM(rx * ry) AS BIGINT) AS sxy
      FROM r GROUP BY g
    )
    SELECT g AS l_returnflag, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS spearman
    FROM s ORDER BY 1
    """,
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Spearman rank correlation of quantity vs extended
    price per return flag (functions/aggs.spearman_corr) — the robust
    monotonic-association sibling of agg_corr_covar's Pearson. Ranks are
    carried as the INTEGER 2·avgrank (2·RANK() + ties − 1), the moment
    sums stay integer-exact under any partition order, and the close is
    fixed-order IEEE double math with a correctly-rounded sqrt — so the
    doubles hash-match the serial oracle bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    return AGG.spearman_corr(li, ["l_returnflag"],
                             "l_quantity", "l_extendedprice")


@query(
    "decon_prefix_filter_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_SHINGLES} AS s FROM documents
    ), sz AS (SELECT doc_id, source, len(s) AS n FROM t WHERE len(s) > 0),
    ex0 AS (SELECT doc_id, unnest(s) AS s FROM t),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(COUNT(*) AS BIGINT) AS i
      FROM ex0 a JOIN ex0 b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT CASE WHEN sa.source IN ('src0', 'src1') THEN ia ELSE ib END
               AS left_id,
             CASE WHEN sa.source IN ('src0', 'src1') THEN ib ELSE ia END
               AS right_id,
             i * 1.0 / (sa.n + sb.n - i) AS jaccard
      FROM inter
      JOIN sz sa ON sa.doc_id = ia
      JOIN sz sb ON sb.doc_id = ib
      WHERE (sa.source IN ('src0', 'src1'))
            <> (sb.source IN ('src0', 'src1'))
        AND i * 1.0 / (sa.n + sb.n - i) >= 0.5
    )
    SELECT left_id, right_id, jaccard FROM pairs
    """,
)
def decon_prefix_filter_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with PROVABLE recall: the cross-table exact
    prefix-filter join (ext/dedup.prefix_filter_join) between an eval
    shard (sources src0/src1) and the rest of the corpus — every leaked
    near-duplicate at shingle-Jaccard >= 0.5, no probabilistic miss. The
    oracle is a blind exhaustive cross-pair scan over the inverted
    index, orientation-normalized so (eval, train) ids land in the same
    columns regardless of id order."""
    d = load_table(spark, sf_dir, "documents")
    is_eval = F.col("source").isin("src0", "src1")
    return DD.prefix_filter_join(d.filter(is_eval), d.filter(~is_eval),
                                 "doc_id", "text", threshold=0.5)


@query(
    "dedup_prefix_index_delta_pairs",
    oracle=f"""
    WITH {_EXACT_PAIRS}
    SELECT id_a, id_b, jaccard FROM exact
    WHERE (id_a % 2 = 1) OR (id_b % 2 = 1)
    """,
)
def dedup_prefix_index_delta_pairs(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """The DELTA-RESTRICTED form of the exact prefix-filter join
    (ext/dedup.prefix_join_index_delta): stored corpus = even doc ids
    served from the persisted ELEMENT index (tokenize-once), nightly
    delta = odd ids, tokenized live. The oracle is the blind exhaustive
    pair scan restricted to pairs touching a delta id — green proves the
    index-served delta path returns exactly the from-scratch answer
    (recall 1.0 survives the split: the shared global order is
    recomputed over stored-elements ∪ delta-elements each run)."""
    import os
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    path = scratch_dir(sf_dir, "elemidx")
    ensure_built(path, lambda: DD.append_element_index(
        d.filter(F.pmod("doc_id", F.lit(2)) == 0), "doc_id", "text",
        path, 0))
    delta = d.filter(F.pmod("doc_id", F.lit(2)) == 1)
    return DD.prefix_join_index_delta(spark, path, delta,
                                      "doc_id", "text", threshold=0.5)


@query(
    "dedup_prefix_stable_order_delta",
    oracle=f"""
    WITH {_EXACT_PAIRS}
    SELECT id_a, id_b, jaccard FROM exact
    WHERE (id_a % 2 = 1) OR (id_b % 2 = 1)
    """,
)
def dedup_prefix_stable_order_delta(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """The STABLE-ORDER delta form of the exact prefix-filter join
    (ext/dedup.prefix_join_stable_delta, VERDICT r6 #5): the element
    order is FROZEN from the first stored batch only (doc_id%4==0), the
    second stored batch (doc_id%4==2) and the nightly delta (odd ids)
    are positioned under that stale order at ingest/query time, and the
    delta query reads positioned prefix rows straight off parquet — no
    df recompute, no corpus-wide window, no re-tokenize. The oracle is
    the same blind exhaustive pair scan as dedup_prefix_index_delta_pairs
    (pairs touching a delta id at J >= 0.5): a hash-match PROVES the
    prefix lemma's order-independence claim — recall 1.0 under a
    genuinely stale order, where staleness costs candidate volume only."""
    d = load_table(spark, sf_dir, "documents")
    path, order_path = _stable_index(spark, sf_dir, d)
    delta = d.filter(F.pmod("doc_id", F.lit(2)) == 1)
    # verify="ids": this fixture's 50% delta makes candidates
    # corpus-sized, the shape the int-array verify is for (the 1%
    # fixture below rides the r13 default, which auto-resolves to
    # positional on this tid-carrying index — see the knob's rationale
    # in prefix_join_stable_delta)
    return DD.prefix_join_stable_delta(spark, path, order_path, delta,
                                       "doc_id", "text", threshold=0.5,
                                       verify="ids")


@query(
    "dedup_prefix_stable_positional",
    oracle=f"""
    WITH {_EXACT_PAIRS}
    SELECT id_a, id_b, jaccard FROM exact
    WHERE (id_a % 2 = 1) OR (id_b % 2 = 1)
    """,
)
def dedup_prefix_stable_positional(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """dedup_prefix_stable_order_delta with the r12 POSITIONAL verify:
    exact Jaccard from the per-doc int-arrays stored in the index's
    sets sidecar (ext/dedup.jaccard_pairs_positional) — each of the
    bulk fixture's candidate pairs costs one array intersect, with no
    per-query vocabulary build (the ids verify's upfront cost, paid
    once at ingest under the order's stable tids) and no pairs×tokens
    shuffle (the counts verify's wall). Same fixture, same oracle, same
    exact output as the other two verifies — the hash match pins the
    three forms equal at driver scale."""
    d = load_table(spark, sf_dir, "documents")
    path, order_path = _stable_index(spark, sf_dir, d)
    delta = d.filter(F.pmod("doc_id", F.lit(2)) == 1)
    return DD.prefix_join_stable_delta(spark, path, order_path, delta,
                                       "doc_id", "text", threshold=0.5,
                                       verify="positional")


#: the 1%-delta fixture plants ONE synthetic near-dup (a copy of the
#: first shingle-bearing stored doc under this id, which is ≡1 mod 100
#: and above any rig's id range) so the query provably returns ≥1 row
#: at every sf — a rows-only registration whose expected count is 0
#: gives the driver a vacuous signal (VERDICT r9 #3)
_PLANT_ID = 900_000_001

_EXACT_PAIRS_AUG = _EXACT_PAIRS.replace("FROM documents", "FROM docs_aug")


@query(
    "dedup_prefix_stable_small_delta",
    oracle=f"""
    WITH docs_aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT {_PLANT_ID} AS doc_id, text FROM documents
      WHERE doc_id = (
        SELECT MIN(doc_id) FROM documents
        WHERE doc_id % 4 = 0 AND len({_SHINGLES}) > 0)
    ),
    {_EXACT_PAIRS_AUG}
    SELECT id_a, id_b, jaccard FROM exact
    WHERE ((id_a % 100 = 1) OR (id_b % 100 = 1))
      AND ((id_a % 2 = 0) OR (id_a % 100 = 1))
      AND ((id_b % 2 = 0) OR (id_b % 100 = 1))
    """,
)
def dedup_prefix_stable_small_delta(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """dedup_prefix_stable_order_delta at a REALISTIC delta fraction
    (1%: doc_id % 100 == 1, plus one PLANTED near-dup — a copy of the
    first shingle-bearing stored doc under id 900000001): the
    oracle-carrying 50%-delta fixture makes "delta" ≈ a full run by
    construction (tokenizing half the corpus IS half the work;
    measured r9, SCALE.md); this form is the shape a nightly ingest
    actually has — delta cost = tokenize 1% + read the pruned stored
    prefix rows. The plant guarantees ≥1 output row at every sf (the
    natural planted pairs are id-random and sparse, so a 1% sample
    often contains no endpoint — r9's registration was rows-only and
    vacuously 0 at driver scale), which also lets this form carry a
    REAL oracle now: the blind all-pairs scan over documents ∪ the
    planted doc, restricted to pairs that touch the delta AND whose
    endpoints are both in stored (even ids) ∪ delta — exactly the
    universe the incremental query sees."""
    d = load_table(spark, sf_dir, "documents")
    path, order_path = _stable_index(spark, sf_dir, d)
    has_sh = F.size(DD.shingles(DD.tokens(F.col("text")), 3)) > 0
    anchor = (d.filter((F.pmod("doc_id", F.lit(4)) == 0) & has_sh)
              .orderBy("doc_id").limit(1)
              .select(F.lit(_PLANT_ID).cast("long").alias("doc_id"),
                      "text"))
    delta = (d.filter(F.pmod("doc_id", F.lit(100)) == 1)
             .select("doc_id", "text").unionByName(anchor))
    return DD.prefix_join_stable_delta(spark, path, order_path, delta,
                                       "doc_id", "text", threshold=0.5)


def _stable_index(spark, sf_dir: str, d: DataFrame) -> tuple[str, str]:
    """Build (or reuse) the shared stable-order index for the
    stable-order queries — through registry.ensure_built, the one
    completion-marker implementation (a killed build's partial dirs are
    WIPED and rebuilt, never reused; this predates ensure_built with a
    hand-rolled marker and was migrated by the r9 review)."""
    import os

    # v2: the r12 engine writes the sets sidecar + tid-carrying order;
    # a v1 scratch dir lacks both, so the tag bump forces one rebuild
    base = scratch_dir(sf_dir, "prefstable_v2")
    path, order_path = os.path.join(base, "idx"), os.path.join(base, "order")

    def _build():
        b0 = d.filter(F.pmod("doc_id", F.lit(4)) == 0)
        DD.freeze_prefix_order(b0, "doc_id", "text", order_path)
        DD.append_positioned_index(b0, "doc_id", "text", path, 0, spark,
                                   order_path)
        DD.append_positioned_index(
            d.filter(F.pmod("doc_id", F.lit(4)) == 2), "doc_id", "text",
            path, 1, spark, order_path)

    ensure_built(base, _build)
    return path, order_path


@query(
    "dedup_prefix_order_staleness",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SHINGLES} AS s FROM documents
    ), ex0 AS (SELECT doc_id, unnest(s) AS s FROM t),
    fr AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS f
           FROM ex0 WHERE doc_id % 4 = 0 GROUP BY 1),
    cur AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS c
            FROM ex0 WHERE doc_id % 2 = 0 GROUP BY 1),
    j AS (
      SELECT COALESCE(fr.f, 0) AS f, COALESCE(cur.c, 0) AS c
      FROM fr FULL JOIN cur ON fr.s = cur.s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_elements,
           CAST(SUM(CASE WHEN f = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_vanished,
           CAST(SUM(ABS(c - f)) AS BIGINT) AS total_abs_drift,
           CAST(MAX(ABS(c - f)) AS BIGINT) AS max_abs_drift,
           CAST(SUM(ABS(c - f)) AS BIGINT) * 1.0
             / CAST(SUM(c) AS BIGINT) AS drift_ratio
    FROM j
    """,
)
def dedup_prefix_order_staleness(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The drift report that schedules an order refresh for the
    stable-order prefix index (ext/dedup.prefix_order_staleness):
    frozen-order dfs vs current dfs, both served from the index's own
    SUM-mergeable (s, df) shards — the stored corpus is never
    re-tokenized. Refreshing the order is a correctness NO-OP (the
    prefix lemma holds for any consistent order); this row tells the
    owner when staleness starts costing candidate volume. The oracle
    reconstructs both df sides from the raw documents table."""
    # shares the index dedup_prefix_stable_order_delta builds (same
    # marker-guarded builder, either query may run first)
    d = load_table(spark, sf_dir, "documents")
    path, order_path = _stable_index(spark, sf_dir, d)
    return DD.prefix_order_staleness(spark, path, order_path)


@query(
    "agg_equidepth_bins",
    oracle="""
    WITH h AS (
      SELECT l_returnflag, l_extendedprice AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2
    ), w AS (
      SELECT l_returnflag, v, c,
             CAST(SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v)
               AS BIGINT) AS cum,
             CAST(SUM(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      FROM h
    ), b AS (SELECT UNNEST(range(1, 8)) AS bin), e AS (
      SELECT l_returnflag, CAST(b.bin AS INT) AS bin,
             MIN(CASE WHEN cum >= FLOOR((b.bin * n + 7) / 8.0)
                      THEN v END) AS edge
      FROM w CROSS JOIN b
      GROUP BY 1, 2
    )
    SELECT l_returnflag, bin, edge FROM e ORDER BY 1, 2
    """,
)
def agg_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 8-bin equi-depth cut points of l_extendedprice per return
    flag (functions/aggs.equidepth_bins): order-statistic edges at
    integer ranks ceil(b*n/8), selected from the value histogram — no
    interpolation, no per-row sort, identical values in both engines
    because edges are actual data values picked by integer-exact rank
    arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    return AGG.equidepth_bins(li, ["l_returnflag"], "l_extendedprice", k=8)


@query(
    "agg_kendall_tau",
    oracle="""
    WITH d AS (
      SELECT l_returnflag AS g, l_quantity AS x, l_discount AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    ), h AS (
      SELECT g, x, y, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY 1, 2, 3
    ), s AS (
      SELECT a.g,
             CAST(SUM(a.c * b.c
                      * CAST(SIGN(b.x - a.x) AS BIGINT)
                      * CAST(SIGN(b.y - a.y) AS BIGINT)) AS BIGINT) AS s2
      FROM h a JOIN h b ON a.g = b.g GROUP BY 1
    ), nn AS (
      SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1
    ), t1 AS (
      SELECT g, CAST(SUM(m * (m - 1)) / 2 AS BIGINT) AS n1 FROM (
        SELECT g, x, SUM(c) AS m FROM h GROUP BY 1, 2) GROUP BY 1
    ), t2 AS (
      SELECT g, CAST(SUM(m * (m - 1)) / 2 AS BIGINT) AS n2 FROM (
        SELECT g, y, SUM(c) AS m FROM h GROUP BY 1, 2) GROUP BY 1
    )
    SELECT s.g AS l_returnflag, nn.n,
           (CAST(s.s2 AS DOUBLE) / 2.0)
           / SQRT((CAST(nn.n AS DOUBLE) * (CAST(nn.n AS DOUBLE) - 1.0) / 2.0
                     - CAST(t1.n1 AS DOUBLE))
                  * (CAST(nn.n AS DOUBLE) * (CAST(nn.n AS DOUBLE) - 1.0) / 2.0
                     - CAST(t2.n2 AS DOUBLE))) AS kendall_tau
    FROM s JOIN nn ON nn.g = s.g
    JOIN t1 ON t1.g = s.g JOIN t2 ON t2.g = s.g
    ORDER BY 1
    """,
)
def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Kendall tau-b of quantity vs discount per return
    flag (functions/aggs.kendall_tau_histogram): 2(C−D) as an INTEGER
    sum over 2-D histogram cell pairs (O(cells²) ≈ 550² per group, not
    O(rows²)), tie terms from the marginal histograms, IEEE close with
    correctly-rounded sqrt — bit-exact vs the serial oracle. Completes
    the rank-association kit next to Spearman and Pearson."""
    li = load_table(spark, sf_dir, "lineitem")
    return AGG.kendall_tau_histogram(li, ["l_returnflag"],
                                     "l_quantity", "l_discount")


@query(
    "agg_kendall_tau_sampled",
    oracle="""
    WITH r AS (
      SELECT l_returnflag AS g, l_extendedprice AS x, l_quantity AS y,
             md5(CAST(l_orderkey AS VARCHAR) || '-'
                 || CAST(l_linenumber AS VARCHAR) || '-'
                 || CAST(CAST(l_extendedprice AS DECIMAL(28,6)) AS VARCHAR)
                 || '-'
                 || CAST(CAST(l_quantity AS DECIMAL(28,6)) AS VARCHAR)) AS h
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ), w AS (
      SELECT g, x, y,
             ROW_NUMBER() OVER (PARTITION BY g, substring(h, 1, 4)
                                ORDER BY h, x, y) AS rn,
             LEAD(x) OVER (PARTITION BY g, substring(h, 1, 4)
                           ORDER BY h, x, y) AS x2,
             LEAD(y) OVER (PARTITION BY g, substring(h, 1, 4)
                           ORDER BY h, x, y) AS y2
      FROM r
    ), p AS (
      SELECT * FROM w WHERE rn % 2 = 1 AND x2 IS NOT NULL
    ), c AS (
      SELECT g,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN (x > x2 AND y > y2)
                             OR (x < x2 AND y < y2)
                           THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
             CAST(SUM(CASE WHEN (x > x2 AND y < y2)
                             OR (x < x2 AND y > y2)
                           THEN 1 ELSE 0 END) AS BIGINT) AS discordant
      FROM p GROUP BY 1
    )
    SELECT g AS l_returnflag, n_pairs, concordant, discordant,
           CAST(n_pairs - concordant - discordant AS BIGINT) AS ties,
           CAST(concordant - discordant AS DOUBLE)
             / CAST(n_pairs AS DOUBLE) AS tau_sampled
    FROM c
    """,
)
def agg_kendall_tau_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-concordance Kendall ESTIMATOR of extended price vs
    quantity per return flag (functions/aggs.kendall_tau_sampled,
    VERDICT r6 #8) — the continuous-measure companion to the exact
    histogram tau-b, which is discrete-only by design. ESTIMATOR
    contract (stated in the function docstring): disjoint row pairs
    sampled by a deterministic md5 hash order inside hash-prefix
    buckets, exact integer concordance counts over that sample, one
    final division — (C − D)/M estimates tau-a with O(1/sqrt(M)) error.
    Deterministic, so the oracle reproduces it bit-for-bit; honest, so
    the name says "sampled" and the row carries the sample size."""
    li = load_table(spark, sf_dir, "lineitem")
    return AGG.kendall_tau_sampled(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity",
        pair_keys=["l_orderkey", "l_linenumber"])

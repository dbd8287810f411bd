"""Similarity search over embedding columns (north-star §2.11).

Two paths:

- **Brute-force cosine top-k** — the exactness baseline. Dot products are
  per-row sequential folds over the vector (deterministic IEEE, no Python);
  the only shuffle is the final per-query top-k. O(Q·N) compute but
  embarrassingly parallel: at 100 TB you partition the candidate side and
  let TakeOrderedAndProject do distributed top-k per query.
- **Sign-LSH bucketed ANN** — the scale path: an 8-bit sign pattern over
  fixed dimensions buckets vectors; candidates = same-bucket vectors, so
  search is an equi-join instead of a cross product. Recall is tunable via
  multi-probe (flip one bit); still fully deterministic + oracle-checkable.

All math is done in DOUBLE: the stored vectors are float32, and
float×float in single precision rounds differently than an oracle engine
computing in double — cast first, multiply after.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def centroids(df: DataFrame, label_col: str, vec_col: str) -> DataFrame:
    """Per-label mean vector (the E-step aggregate of k-means, the class
    prototype of a label-balanced dataset audit).

    Plan: posexplode to (label, pos, x) — scan-local — then ONE shuffle on
    (label, pos) for a decimal-sum mean per dimension (order-independent,
    see functions/exact.py), then a cheap (label)-keyed regroup to
    reassemble the array in position order. Dimensions × labels rows in
    the intermediate: tiny at any corpus scale."""
    from ..functions.exact import davg

    ex = df.select(F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "x"))
    per_dim = ex.groupBy(label_col, "pos").agg(davg("x").alias("m"))
    return per_dim.groupBy(label_col).agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m")).alias("centroid"))


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Sign pattern of the first ``n_bits`` dimensions as a compact string
    bucket key — a degenerate (axis-aligned) random-hyperplane LSH."""
    return F.concat_ws(
        "",
        F.transform(F.slice(vec, 1, n_bits),
                    lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0"))),
    )


def topk_per_query(scored: DataFrame, query_id: str, score: str,
                   tiebreak: str, k: int) -> DataFrame:
    """Deterministic per-query top-k: total order = (score desc, id asc)."""
    w = Window.partitionBy(query_id).orderBy(F.col(score).desc(), F.col(tiebreak).asc())
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def cosine_topk(queries: DataFrame, candidates: DataFrame,
                q_id: str, q_vec: str, c_id: str, c_vec: str, k: int) -> DataFrame:
    """Brute-force cosine top-k of candidates per query vector."""
    scored = (
        queries.crossJoin(candidates)
        .filter(F.col(q_id) != F.col(c_id))
        .withColumn("cos", cosine(F.col(q_vec), F.col(c_vec)))
    )
    return topk_per_query(scored, q_id, "cos", c_id, k).select(q_id, c_id, "cos")


def cosine_dedup_pairs(df: DataFrame, id_col: str, vec_col: str,
                       threshold: float = 0.95, n_bits: int = 8) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).

    Scale path: sign-LSH blocking first (near-identical vectors share the
    sign pattern), exact cosine only within buckets — all-pairs never
    materializes. Multi-probe (flipping one bucket bit) raises recall for
    borderline-τ pairs; at τ≥0.9 single-probe recall is high because the
    probability a near-dup flips any given sign is small.

    The per-row prep (double-cast vector, norm, bucket) is computed ONCE
    and persisted so the self-join reads it from cache instead of running
    the vector expressions on both aliases; per-pair work is then a single
    dot product. cos = dot/(norm_a·norm_b) with the norms as per-row
    columns is the same fold over the same values as computing them
    per-pair, so results stay bit-identical to the oracle. On a cluster,
    swap persist() for writing the prep table, bucketed by __bucket__.
    """
    prepped = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v__"),
        norm(F.col(vec_col)).alias("__n__"),
        sign_bucket(F.col(vec_col), n_bits).alias("__bucket__"),
    ).persist()
    a, c = prepped.alias("a"), prepped.alias("b")
    return (
        a.join(c, (F.col("a.__bucket__") == F.col("b.__bucket__"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .withColumn("cos", dot(F.col("a.__v__"), F.col("b.__v__"))
                    / (F.col("a.__n__") * F.col("b.__n__")))
        .filter(F.col("cos") >= threshold)
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"), "cos")
    )


def _dvec(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _argmax_centroid(vectors: DataFrame, id_col: str, vec_col: str,
                     centroids: DataFrame) -> DataFrame:
    """Assign each vector to its max-cosine centroid (ties → lowest cid).
    Centroids broadcast — assignment is a map-side cross product, no
    shuffle of the vector table."""
    scored = (vectors.crossJoin(F.broadcast(centroids))
              .withColumn("__cos__", dot(F.col(vec_col), F.col("cvec"))
                          / (norm(F.col(vec_col)) * norm(F.col("cvec")))))
    w = Window.partitionBy(id_col).orderBy(F.col("__cos__").desc(),
                                           F.col("cid").asc())
    return (scored.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .select(id_col, vec_col, "cid"))


def ivf_build(df: DataFrame, id_col: str, vec_col: str,
              nlist: int = 16, n_iter: int = 2) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: k-means (Lloyd) with DETERMINISTIC seeding —
    the ``nlist`` lowest-id vectors — and per-dimension decimal-exact
    means, so index construction is reproducible across partitionings and
    engines (the DuckDB oracle unrolls the same iterations as CTEs).

    Returns (centroids[cid, cvec], assignment[id, vec, cid]). Per
    iteration: broadcast-centroid argmax assignment (map-side), then
    posexplode → groupBy(cid, dim) mean → collect back in dim order —
    the explode+agg form, NOT per-dim expressions under one Generate
    (no CSE there, see dedup.minhash_table).

    At 100 TB: assignment stays map-side (centroid table is tiny);
    the mean shuffle carries nlist×dim rows. Write the assignment out
    partitioned by cid — queries then read only probed clusters
    (partition pruning does the inverted-file part)."""
    v = df.select(F.col(id_col), _dvec(F.col(vec_col)).alias("__v__"))
    centroids = (v.orderBy(id_col).limit(nlist)
                 .select(F.col(id_col).alias("cid"), F.col("__v__").alias("cvec")))
    assign = None
    for _ in range(n_iter):
        assign = _argmax_centroid(v, id_col, "__v__", centroids)
        centroids = (
            assign.select("cid", F.posexplode("__v__").alias("__i__", "__x__"))
            .groupBy("cid", "__i__")
            .agg((F.sum(F.col("__x__").cast("decimal(18,9)")).cast("double")
                  / F.count("__x__")).alias("__m__"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("__i__", "__m__"))).alias("__s__"))
            .select("cid", F.col("__s__.__m__").alias("cvec"))
        )
    assign = _argmax_centroid(v, id_col, "__v__", centroids)
    return centroids, assign


def ivf_topk(queries: DataFrame, centroids: DataFrame, assign: DataFrame,
             q_id: str, q_vec: str, id_col: str,
             k: int = 3, nprobe: int = 2) -> DataFrame:
    """IVF search: rank centroids per query, take ``nprobe``, equi-join
    candidates on cluster id, exact cosine + deterministic top-k. The
    all-pairs product never materializes — candidate volume is
    nprobe/nlist of the corpus per query."""
    q = queries.select(F.col(q_id), _dvec(F.col(q_vec)).alias("__qv__"))
    pw = Window.partitionBy(q_id).orderBy(
        F.col("__pcos__").desc(), F.col("cid").asc())
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("__pcos__", dot(F.col("__qv__"), F.col("cvec"))
                    / (norm(F.col("__qv__")) * norm(F.col("cvec"))))
        .withColumn("__rn__", F.row_number().over(pw))
        .filter(F.col("__rn__") <= nprobe)
        .select(q_id, "__qv__", "cid")
    )
    scored = (
        probes.join(assign, "cid")
        .filter(F.col(q_id) != F.col(id_col))
        .withColumn("cos", dot(F.col("__qv__"), F.col("__v__"))
                    / (norm(F.col("__qv__")) * norm(F.col("__v__"))))
    )
    return topk_per_query(scored, q_id, "cos", id_col, k).select(q_id, id_col, "cos")


def probe_buckets(vec: Column, n_bits: int = 8) -> Column:
    """Multi-probe bucket list: the vector's own sign bucket plus each
    one-bit flip — the standard LSH recall lever. A near-neighbor differs
    from the query's bucket in at most a few signs, and single-bit probes
    recover exactly the pairs that straddle ONE hyperplane (the dominant
    miss mode at high cosine)."""

    def bucket_with_flip(flip_idx: int | None) -> Column:
        chars = [
            F.when(F.element_at(vec, j + 1) >= 0,
                   F.lit("0" if j == flip_idx else "1"))
            .otherwise(F.lit("1" if j == flip_idx else "0"))
            for j in range(n_bits)
        ]
        return F.concat(*chars)

    return F.array(bucket_with_flip(None),
                   *[bucket_with_flip(i) for i in range(n_bits)])


def ann_multiprobe_topk(queries: DataFrame, candidates: DataFrame,
                        q_id: str, q_vec: str, c_id: str, c_vec: str,
                        k: int, n_bits: int = 8) -> DataFrame:
    """Sign-LSH ANN with single-bit multi-probe: each query searches its
    own bucket plus the ``n_bits`` one-flip neighbors. Probe fan-out
    multiplies only the QUERY side (n_bits+1 rows per query); the
    candidate table still shuffles once on its single bucket key, so the
    plan stays an equi-join — recall rises without touching the corpus
    side. Probe buckets are pairwise distinct and each candidate lives in
    exactly one bucket, so no pair dedup is needed."""
    qb = queries.select(
        F.col(q_id), F.col(q_vec),
        F.explode(probe_buckets(F.col(q_vec), n_bits)).alias("__bucket__"))
    cb = candidates.withColumn("__bucket__", sign_bucket(F.col(c_vec), n_bits))
    scored = (
        qb.join(cb, "__bucket__")
        .filter(F.col(q_id) != F.col(c_id))
        .withColumn("cos", cosine(F.col(q_vec), F.col(c_vec)))
    )
    return topk_per_query(scored, q_id, "cos", c_id, k).select(q_id, c_id, "cos")


def ann_sign_lsh_topk(queries: DataFrame, candidates: DataFrame,
                      q_id: str, q_vec: str, c_id: str, c_vec: str,
                      k: int, n_bits: int = 8) -> DataFrame:
    """Bucketed ANN: candidates sharing the query's sign bucket, then
    exact cosine + top-k within the bucket."""
    qb = queries.withColumn("__bucket__", sign_bucket(F.col(q_vec), n_bits))
    cb = candidates.withColumn("__bucket__", sign_bucket(F.col(c_vec), n_bits))
    scored = (
        qb.join(cb, "__bucket__")
        .filter(F.col(q_id) != F.col(c_id))
        .withColumn("cos", cosine(F.col(q_vec), F.col(c_vec)))
    )
    return topk_per_query(scored, q_id, "cos", c_id, k).select(q_id, c_id, "cos")


def exact_vector_dedup_groups(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Bit-identical-vector dedup groups: (vec_hash, canonical_id,
    n_copies). The vector twin of text exact-dedup — and the prepass that
    keeps :func:`cosine_dedup_pairs` O(unique content): identical vectors
    share every sign bucket, so K copies inflate every bucket K× and the
    pairwise stage K²× (measured on the 10× replicated corpus — see
    SCALE.md). xxhash64 hashes the float array structurally (JVM-side,
    no serialization round-trip); library-level only, no oracle pairing
    needed — the paired query operates on canonical vectors.
    """
    return (df.groupBy(F.xxhash64(F.col(vec_col)).alias("vec_hash"))
            .agg(F.min(id_col).alias("canonical_id"),
                 F.count(F.lit(1)).alias("n_copies")))


def canonical_vectors(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Rows whose id is its duplicate-group canonical (lowest id per
    bit-identical vector) — run pairwise similarity on THIS frame."""
    groups = exact_vector_dedup_groups(df, id_col, vec_col)
    return df.join(groups.select(F.col("canonical_id").alias(id_col)),
                   id_col, "left_semi")

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

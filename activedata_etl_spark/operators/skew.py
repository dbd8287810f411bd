"""Skew-handling helpers for hot-key joins and aggregations.

The reference never needed these — its ETL blocks are similar-sized by
construction and ES handles shard routing (SURVEY.md §4.2). At 100 TB a
single hot key (one boilerplate document hash, one megacustomer) stalls a
shuffle join on one task. Two standard remedies, both pure DataFrame:

- **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on by
  default in our session) — splits oversized partitions at runtime.
  Prefer it; use salting only when AQE can't help (aggregations, or
  joins whose skewed side must build the hash table).
- **Salting** (here): spread each hot left-side key over N salt buckets
  and replicate the right side N×. Exact same join result, N× less skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(left: DataFrame, right: DataFrame, on: str, salt: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    Use when ``left`` has heavy key skew and ``right`` is too large to
    broadcast but small enough to replicate ``salt``× through the shuffle.
    """
    l_salted = left.withColumn(
        "__salt__", F.pmod(F.xxhash64(*left.columns), F.lit(salt)))
    r_salted = right.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0).cast("bigint"),
                                         F.lit(salt - 1).cast("bigint"))))
    out = l_salted.join(r_salted, on=[on, "__salt__"], how=how)
    return out.drop("__salt__")


def salted_count_distinct(df: DataFrame, key: str, value: str,
                          salt: int = 16) -> DataFrame:
    """Two-phase distinct count for skewed group keys: first aggregate
    (key, salt) partials, then merge — the classic partial-agg rewrite,
    made explicit for cases where the values themselves are wide."""
    stage1 = (
        df.withColumn("__salt__", F.pmod(F.xxhash64(F.col(value)), F.lit(salt)))
        .groupBy(key, "__salt__")
        .agg(F.countDistinct(value).alias("__partial__"))
    )
    return stage1.groupBy(key).agg(F.sum("__partial__").alias(f"n_{value}"))


def key_skew_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pre-join skew diagnostics: for each candidate key column, its
    NDV, the corpus share of the hottest key, and of the 10 hottest —
    the numbers that pick between a plain shuffle join, AQE skew split,
    salting, or broadcasting the other side (SCALE.md's skew section,
    as a query instead of a guess).

    Plan, per column: one (key, count) aggregation, one tiny scalar agg
    over it, and a distributed top-10 (TakeOrdered — no global window,
    so an NDV of 10^9 keys never lands in one task). Shares are IEEE
    divisions of exact bigints. At 100 TB run it on the join columns
    ahead of the nightly join, or on a hash-sampled slice.

    Output: (column, n_rows, ndv, top1_share, top10_share)."""
    from functools import reduce

    outs = []
    for c in cols:
        counts = (df.groupBy(F.col(c).alias("k"))
                  .agg(F.count(F.lit(1)).alias("n")))
        stats = counts.agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("ndv"),
            F.max("n").cast("bigint").alias("__top1__"))
        top10 = (counts.orderBy(F.desc("n")).limit(10)
                 .agg(F.sum("n").cast("bigint").alias("__t10__")))
        outs.append(
            stats.crossJoin(top10).select(
                F.lit(c).alias("column"), "n_rows", "ndv",
                (F.col("__top1__") / F.col("n_rows")).alias("top1_share"),
                (F.col("__t10__") / F.col("n_rows")).alias("top10_share")))
    return reduce(lambda a, b: a.unionByName(b), outs)

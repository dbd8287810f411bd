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

"""Table loading for the testdata star schema + extension tables.

The reference's ETL surface reads gz JSON-lines blocks from S3 and writes
to Elasticsearch rollover indexes (reference: pyLibrary/aws/s3.py,
pyLibrary/env/rollover_index.py — see SURVEY.md §2.1). Our engine
standardizes on Parquet: columnar scan + predicate pushdown + partition
pruning replace the inverted index, and `spark.read.parquet` on a
date-partitioned layout replaces index rollover.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import ensure_runtime_confs

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Per-session memo of loaded tables: DataFrames are immutable lazy plans, so
# handing back the same object is safe and skips repeated parquet footer /
# schema reads when many queries touch the same table. Keyed weakly by
# session so a stopped session's entries are collectable.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing types where parquet physical
    types don't map cleanly onto Spark SQL types.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark rejects;
    with ``spark.sql.legacy.parquet.nanosAsLong`` it reads as LongType
    nanoseconds, converted here to a microsecond timestamp. The conversion is
    lossless for this data (sub-microsecond digits are zero — FIXTURES.md)
    and uses integer division so no precision is lost at ~1.7e18 magnitudes.
    """
    try:
        per_session = _TABLE_CACHE.setdefault(spark, {})
    except TypeError:  # un-weakref-able session double (tests/mocks)
        per_session = {}
    key = (os.path.abspath(sf_dir), name)
    df = per_session.get(key)
    if df is None:
        ensure_runtime_confs(spark)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        per_session[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def parallelize_narrow_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Widen a scan that has fewer splits than cores so per-row CPU work
    (regex kits, hashing, UDF batches) spreads across the executor.

    Parquet splits at row-group boundaries: a single-row-group file (or a
    gz JSON blob) scans as ONE task no matter how heavy the map work is,
    and neither Catalyst nor AQE will widen it. The round-robin shuffle
    here is cheap exactly when it triggers (input is at most a few splits
    ⇒ small); at real scale sources have splits ≫ cores and this is a
    no-op — it can never shuffle big data.
    """
    from .session import default_parallelism

    target = min_parts or default_parallelism()
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def describe_columns(df: DataFrame) -> DataFrame:
    """Column metadata catalog — the reference's queryable ``meta.columns``
    (``vendor/jx_elasticsearch/meta.py :: ColumnList``): per column its
    name, type, exact cardinality and null count, computed in ONE
    aggregate pass then unpivoted (no per-column jobs)."""
    aggs = []
    for name, dtype in df.dtypes:
        aggs.append(F.countDistinct(F.col(name)).alias(f"__card_{name}"))
        aggs.append((F.count(F.lit(1)) - F.count(F.col(name))).alias(f"__nulls_{name}"))
    stats = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(name).alias("column"),
            F.lit(dtype).alias("dtype"),
            F.col(f"__card_{name}").alias("cardinality"),
            F.col(f"__nulls_{name}").alias("n_nulls"),
        )
        for name, dtype in df.dtypes
    ])
    return stats.select(F.explode(rows).alias("c")).select("c.*")


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs

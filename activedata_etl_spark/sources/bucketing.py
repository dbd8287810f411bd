"""Bucketed table layout: co-located joins and aggregations.

At 100 TB the expensive shuffles are fact⨝fact joins (lineitem⨝orders)
and high-cardinality groupBys. Bucketing pre-partitions data ON DISK by
the join/group key: both sides bucketed by the same key into the same
bucket count join with NO exchange — the shuffle is paid once at write
time and amortized over every subsequent query (the reference's analog:
S3 re-blocking between ETL stages, but that had no notion of key
co-location — this is strictly stronger).

Spark requires `saveAsTable` (metastore-backed) for bucket metadata;
plain `.parquet(path)` writes lose it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 32,
                   sort_by: str | None = None) -> None:
    """Write a bucketed (and optionally sorted) managed table. Sorting
    within buckets additionally removes the sort from sort-merge joins."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   key: str, how: str = "inner") -> DataFrame:
    """Join two same-key same-bucket-count tables: plan has no Exchange
    on either side (verify with .explain — tests assert this)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)

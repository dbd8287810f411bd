"""gz JSON-lines source/sink — the reference's native block format.

Every S3 block in ActiveData-ETL is gzipped JSON-lines read line-at-a-time
(``vendor/pyLibrary/aws/s3.py :: Bucket.read_lines``) and written under a
hierarchical etl key (``activedata_etl/sinks/s3_bucket.py``). Spark's JSON
datasource handles the same layout natively — codec detection from the
``.gz`` extension, schema inference or explicit schema, line-per-doc —
so the "source" is a couple of options, not 600 LoC.

Parquet remains the engine's preferred storage (SURVEY.md §2.1); these
exist for ingesting/interop with reference-shaped data. Note gzip files
are NOT splittable: one .gz block = one task, which matches the
reference's block-parallelism model — many small blocks, not one big one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(spark: SparkSession, path: str,
               schema: StructType | str | None = None) -> DataFrame:
    """Read (optionally gzipped) JSON-lines blocks. Pass a schema in
    production — inference is an extra full pass."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, gzip: bool = True,
                mode: str = "overwrite") -> None:
    """Write JSON-lines blocks (one object per line, gzip per file)."""
    w = df.write.mode(mode)
    if gzip:
        w = w.option("compression", "gzip")
    w.json(path)

"""activedata_etl_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of mozilla/ActiveData-ETL.

Architecture (Spark-first, not a port — see SURVEY.md):

- ``session``   — SparkSession builder (AQE, UTC, Arrow, nanos-parquet fix).
- ``io``        — table loaders/registration for the testdata star schema.
- ``functions`` — jx ("JSON expressions") scalar/aggregate semantics as
  Column builders: null-safe eq, null-ignoring variadic add/mult, safe div,
  floor-to-multiple, find/between string kit, zero-moment stats, …
- ``operators`` — relational building blocks the jx surface needs that are
  compositions over DataFrame ops: edge-domain dense cubes, window specs,
  as-of/range join helpers, leaves-flattening, set ops.
- ``plans``     — the jx JSON query front-end (QueryOp → DataFrame).
- ``sources``   — ETL dataflow surface: provenance-stamped read→transform→
  partitioned-write templates (the reference's S3/SQS/ES pipeline,
  re-expressed as Parquet + Structured Streaming).
- ``streaming`` — batch-equivalent and streaming time windows,
  sessionization, stateful dedup.
- ``ext``       — 100 TB training-data-pipeline operators: dedup
  (exact/minhash/simhash), similarity search, text analysis, multimodal.

The reference (mozilla/ActiveData-ETL, vendored jx_* libraries) defines WHAT
these compute; every implementation here is an idiomatic Spark DataFrame/SQL
plan so Catalyst/Tungsten pick the physical strategy.
"""

__version__ = "0.1.0"

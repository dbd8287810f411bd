"""SparkSession construction with the engine's required configuration.

Scale posture: these defaults are written for a real cluster (AQE on,
skew-join handling, partition coalescing); locally they run on
``local[$SPARK_GRAFT_CPUS]``. Configs that must hold even when the caller
owns the session (e.g. the verify driver) are applied at runtime via
:func:`ensure_runtime_confs`.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# SQL confs that are runtime-settable and REQUIRED for correctness on the
# testdata (see FIXTURES.md: events.parquet stores timestamp[ns], which
# Spark's vectorized parquet reader rejects outright without the legacy
# nanos-as-long flag).
RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # Fixture timestamps are parquet TIMESTAMP(isAdjustedToUTC=false); with
    # NTZ inference (Spark 4 default) they'd read as TIMESTAMP_NTZ, which
    # watermarks/window() reject and which diverges from the LTZ arithmetic
    # the oracles assume. Under the UTC session zone LTZ values are
    # identical to the stored naive values, so this is a pure type fix.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}

DEFAULT_CONFS = {
    **RUNTIME_CONFS,
    # AQE: runtime re-planning — coalesce small shuffle partitions, convert
    # sort-merge→broadcast when a side turns out small, split skewed joins.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Coalesce floor 64k (default 1MB): at cluster scale partitions sit
    # near the 64MB advisory so this never binds; on small/local shuffles
    # it stops AQE collapsing a 3MB exchange to 3 tasks and serializing
    # reduce-side work (measured ~20% on sort/sessionize-heavy queries).
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    # Arrow for any pandas_udf path (similarity / multimodal operators).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # r13 (guide §6): zstd for everything the engine WRITES (persisted
    # indexes, snowflake child tables, sink output). Measured on the
    # snowflake scratch roundtrip at sf0.1: 31% smaller files AND the
    # timed re-read ~25% faster than snappy (2969→2058 KB, read median
    # 0.19–0.24→0.134s) — smaller IO wins even locally; at cluster
    # scale the size delta is the dominant term. Read side is
    # codec-agnostic (per-file metadata), so existing indexes stay
    # readable.
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.codegen.cache.maxEntries": "5000",
    "spark.ui.enabled": "false",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "activedata_etl_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    ``spark.sql.shuffle.partitions`` is sized to the local core count rather
    than Spark's default 200: at local scale 200 partitions of a 60k-row
    shuffle is pure scheduling overhead, and on a cluster AQE coalescing
    makes the static number a ceiling, not a target.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        # local mode: executors live in the driver JVM, whose default 1g
        # heap starves 32 task threads (GC meltdown / failed broadcast
        # builds at 10× bench scale). Only effective at JVM launch — an
        # external driver's session keeps its own sizing.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply correctness-critical confs to a session we did not build.

    The verify driver passes its own SparkSession to ``entry``/``queries``;
    without the nanos flag, reading ``events.parquet`` raises
    ``[PARQUET_TYPE_ILLEGAL]``. All keys here are runtime-settable SQL confs.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable in this session build; reads may still work
    _ensure_package_shipped(spark)
    return spark


def _ensure_package_shipped(spark: SparkSession) -> None:
    """Ship this package to Python workers via ``addPyFile``.

    An external driver may launch its session from any cwd without this
    repo on PYTHONPATH; its workers then cannot unpickle any UDF that
    cloudpickle serialized BY REFERENCE into our modules. Our own UDF
    closures are written self-contained (by-value), so this is a safety
    net — and it makes user-authored UDFs importing this package work too.
    One zip per interpreter, added once per SparkContext.
    """
    global _PKG_ZIP
    sc = spark.sparkContext
    if getattr(sc, "_adetl_pyfile_added", False):
        return
    try:
        if _PKG_ZIP is None:
            import shutil
            import tempfile

            pkg_dir = os.path.dirname(os.path.abspath(__file__))
            base = os.path.join(tempfile.mkdtemp(prefix="adetl_pkg_"),
                                "activedata_etl_spark")
            _PKG_ZIP = shutil.make_archive(
                base, "zip", os.path.dirname(pkg_dir),
                os.path.basename(pkg_dir))
        sc.addPyFile(_PKG_ZIP)
        sc._adetl_pyfile_added = True
    except Exception:
        pass  # never let the safety net break a read


_PKG_ZIP: str | None = None

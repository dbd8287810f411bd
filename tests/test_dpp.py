"""Dynamic partition pruning: a join against a filtered dim must prune
fact partitions at runtime — the 100 TB date-partitioned layout's key
optimization."""

from pyspark.sql import functions as F

from activedata_etl_spark.io import load_table
from activedata_etl_spark.sources.etl import rollover_write


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_month")
    rollover_write(o, path, date_col="o_orderdate", unit="month")
    fact = spark.read.parquet(path)

    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [("1995-03-01", "target"), ("1997-07-01", "other")], "period string, tag string"
    ).select(F.col("period").cast("date").alias("__period__"), "tag") \
        .write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).filter(F.col("tag") == "target")

    joined = fact.join(dim, "__period__")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1500]

    got = joined.count()
    want = fact.filter(F.col("__period__") == "1995-03-01").count()
    assert got == want > 0

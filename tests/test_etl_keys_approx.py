"""etl key chain round-trip, rate-source smoke, approx-operator bounds."""

from pyspark.sql import functions as F

from activedata_etl_spark.functions.aggs import approx_cardinality
from activedata_etl_spark.io import load_table
from activedata_etl_spark.sources.etl import etl2key, key2etl
from activedata_etl_spark.streaming.stream import message_stream


def test_etl_key_roundtrip():
    etl = {"id": 2, "source": {"id": 7, "source": {"id": "t1"}}}
    key = etl2key(etl)
    assert key == "t1.7.2"
    assert key2etl(key) == etl
    assert etl2key(key2etl("bucket.0.12.3")) == "bucket.0.12.3"


def test_message_stream_is_streaming(spark):
    s = message_stream(spark)
    assert s.isStreaming
    assert set(s.columns) == {"timestamp", "value"}


def test_approx_cardinality_bounds(spark, sf_dir):
    """HLL (the reference's ES cardinality) within its documented ~5%
    default rsd of the exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        approx_cardinality("l_partkey").alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= 0.1 * row["exact"]


def test_approx_percentile_bounds(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= 0.05 * row["exact"]

"""Schema evolution: the reference's raison d'être is schemaless docs
(typed encoding, mergeable mappings). Spark equivalents under test:
mergeSchema parquet reads, unionByName with missing columns, and the
scalar-or-array normalization (~N~ typed encoding)."""

from pyspark.sql import functions as F

from activedata_etl_spark.io import load_table
from activedata_etl_spark.operators.nested import normalize_to_array


def test_merge_schema_read(spark, sf_dir, tmp_path):
    """Blocks written at different pipeline versions (columns added over
    time) read as one table with NULLs for absent columns."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v2 = spark.createDataFrame([(2, "b", 3.5)], "id long, name string, score double")
    v1.write.parquet(path + "/block=1")
    v2.write.parquet(path + "/block=2")
    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 3.5


def test_union_by_name_missing_columns(spark):
    """ConcatSources over heterogeneous blocks (SURVEY §2.8)."""
    a = spark.createDataFrame([(1, "x")], "id long, name string")
    b = spark.createDataFrame([(2, 9.9)], "id long, score double")
    u = a.unionByName(b, allowMissingColumns=True)
    rows = {r["id"]: r for r in u.collect()}
    assert rows[1]["score"] is None and rows[2]["name"] is None
    assert rows[2]["score"] == 9.9


def test_normalize_to_array(spark):
    """Typed-encoding ~N~ semantics: scalar-or-array duality normalized to
    array at ingest (SURVEY §1.2). Exercised through VariantType, the
    Spark-4 representation of ragged JSON."""
    df = spark.createDataFrame(
        [(1, '{"v": 5}'), (2, '{"v": [1, 2]}'), (3, '{"x": 0}')],
        "id long, raw string",
    ).select("id", F.parse_json(F.col("raw")).alias("doc"))
    out = df.select(
        "id", normalize_to_array(F.col("doc"), "v").alias("vals")
    ).collect()
    got = {r["id"]: r["vals"] for r in out}
    assert got == {1: [5], 2: [1, 2], 3: []}


def test_variant_runtime_type_tests(spark):
    """jx is_number/is_string/is_boolean over ragged JSON: per-VALUE type,
    not per-column — the dynamic typing the reference gets from Python."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.operators import nested as N

    docs = spark.createDataFrame(
        [('{"k": 1}',), ('{"k": 2.5}',), ('{"k": "x"}',), ('{"k": true}',),
         ('{"k": null}',), ('{}',)], "j string"
    ).select(F.parse_json("j").alias("doc"))
    v = F.try_variant_get("doc", "$.k", "variant")
    out = docs.select(
        N.variant_is_number(v).alias("num"),
        N.variant_is_string(v).alias("s"),
        N.variant_is_boolean(v).alias("b"),
    ).collect()
    assert [(r.num, r.s, r.b) for r in out] == [
        (True, False, False), (True, False, False), (False, True, False),
        (False, False, True), (False, False, False), (False, False, False)]

"""Typed-encoding round-trip (mo_json/typed_encoder semantics): suffix
keys per leaf type, mapping-conflict-free storage, lossless decode."""

import json

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from activedata_etl_spark.operators import typed as TY


def test_encode_shapes():
    assert TY.encode_value({"a": 3}) == {"~e~": 1, "a": {"~n~": 3}}
    assert TY.encode_value({"a": "x"}) == {"~e~": 1, "a": {"~s~": "x"}}
    assert TY.encode_value({"a": True}) == {"~e~": 1, "a": {"~b~": True}}
    assert TY.encode_value({"a": [1, "x"]}) == {
        "~e~": 1, "a": {"~a~": [{"~n~": 1}, {"~s~": "x"}]}}
    # null is missing: dropped, not encoded
    assert TY.encode_value({"a": None, "b": 1}) == {"~e~": 1, "b": {"~n~": 1}}
    # nesting recurses
    assert TY.encode_value({"a": {"b": 2}}) == {
        "~e~": 1, "a": {"~e~": 1, "b": {"~n~": 2}}}


_json_scalars = (st.booleans() | st.integers(min_value=-10**9, max_value=10**9)
                 | st.floats(allow_nan=False, allow_infinity=False, width=32)
                 | st.text(max_size=8))
_json_values = st.recursive(
    _json_scalars,
    lambda children: (st.lists(children, max_size=4)
                      | st.dictionaries(st.text(max_size=6).filter(
                          lambda k: "~" not in k), children, max_size=4)),
    max_leaves=12)


@given(st.dictionaries(st.text(min_size=1, max_size=6).filter(
    lambda k: "~" not in k), _json_values, max_size=5))
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(doc):
    # None-free docs round-trip losslessly (null == missing is the
    # documented lossy-by-design case)
    assert TY.decode_value(TY.encode_value(doc)) == doc


def test_spark_roundtrip_and_mapping_conflict(spark, tmp_path):
    """The POINT of the encoding: docs whose field 'a' is number/string/
    array land at distinct encoded paths, so one store holds all three
    without schema conflict — and json schema inference UNIONS them."""
    raw = ['{"a": 3}', '{"a": "x"}', '{"a": [1, 2]}',
           '{"a": {"b": true}}', '{"a": null}']
    df = spark.createDataFrame([(i, r) for i, r in enumerate(raw)],
                               "id bigint, doc string")
    enc = df.select("id", TY.typed_encode_json("doc").alias("enc"),
                    TY.typed_decode_json(TY.typed_encode_json("doc")).alias("back"))
    rows = {r["id"]: r for r in enc.collect()}
    for i, r in enumerate(raw):
        expect = {k: v for k, v in json.loads(r).items() if v is not None}
        assert json.loads(rows[i]["back"]) == expect

    # store the encoded docs; read back with schema inference: the four
    # shapes of 'a' must merge into one struct with per-type subfields
    path = str(tmp_path / "typed.jsonl")
    with open(path, "w") as f:
        for r in rows.values():
            f.write(r["enc"] + "\n")
    merged = spark.read.json(path)
    names = {f.name for f in merged.schema["a"].dataType.fields}
    assert {"~n~", "~s~", "~a~", "~e~"} <= names
    # and each doc's value is reachable at its typed path
    got = merged.select(
        F.col("a.~n~").alias("n"), F.col("a.~s~").alias("s")).collect()
    assert {r["n"] for r in got} == {3, None}
    assert {r["s"] for r in got} == {"x", None}


def test_compiled_encoder_matches_udf_bytes(spark):
    """The schema-known compiled path (pure Column expressions) must be
    BYTE-identical to the schemaless UDF walk on schema-conformant docs —
    incl. null-dropping, empty object/array, nested object, and arrays
    with null elements."""
    docs = [
        '{"v":"en","n":3.5,"tags":[1,2],"meta":{"k":"x"},"b":true}',
        '{"v":null,"n":2.5,"tags":[],"meta":{}}',
        '{"tags":[5,null,7]}',
        '{"meta":{"k":null},"b":false}',
        '{}',
        None,
    ]
    ddl = "v string, n double, tags array<bigint>, meta struct<k: string>, b boolean"
    df = spark.createDataFrame([(d,) for d in docs], "raw: string")
    rows = df.select(
        TY.typed_encode_json("raw").alias("udf"),
        TY.typed_encode_compiled("raw", ddl).alias("comp"),
    ).collect()
    for r in rows:
        assert r["udf"] == r["comp"]


def test_compiled_encoder_is_jvm_only(spark):
    """No Python in the compiled plan: the whole rewrite must live in
    JVM expressions (the UDF fallback exists for schemaless data only)."""
    df = spark.range(5).select(
        F.concat(F.lit('{"a": '), F.col("id").cast("string"),
                 F.lit("}")).alias("raw"))
    out = df.select(TY.typed_encode_compiled("raw", "a bigint").alias("e"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan
    assert [r["e"] for r in out.orderBy(F.col("e")).limit(1).collect()] \
        == ['{"~e~":1,"a":{"~n~":0}}']


def test_typed_readback_single_parse(spark, sf_dir):
    """r13 opt regression pin: the registered typed-encoding queries read
    the four typed paths back through ONE from_json, not four independent
    get_json_object parses of the same encoded string (guide §4.1 —
    measured ~10% of the query at sf0.1; rows verified bit-equal to the
    get_json_object form on the full fixture before the rewrite).

    ADVICE r13: typed_encoding_fields' encoder is a UDF with no
    from_json of its own, so an EXACT count == 1 pins the single-parse
    property (an optimizer duplicating the parse 4× would slip past a
    >= 1 assert). The compiled twin's encoder branches carry their own
    from_json calls (several textual copies per branch inside the
    to_json(struct(...)) expression — physical CSE collapses those),
    so there the pin counts the READBACK parse by its schema signature:
    exactly one parse against the typed-key struct."""
    from activedata_etl_spark.queries import QUERIES

    fields = QUERIES["typed_encoding_fields"](spark, sf_dir)
    plan = fields._jdf.queryExecution().optimizedPlan().toString()
    assert "get_json_object" not in plan
    assert plan.count("from_json") == 1

    compiled = QUERIES["typed_encoding_compiled"](spark, sf_dir)
    plan = compiled._jdf.queryExecution().optimizedPlan().toString()
    assert "get_json_object" not in plan
    assert plan.count("from_json(StructField(v,StructType") == 1

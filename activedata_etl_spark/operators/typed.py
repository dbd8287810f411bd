"""Typed-encoding round-trip — the reference's most distinctive ingest
behavior (``vendor/mo_json/typed_encoder.py``).

Before indexing, every leaf of a schemaless doc is rewritten under a
type-suffixed key so ONE store can hold heterogeneous docs without
mapping conflicts:

    {"a": 3}      → {"~e~": 1, "a": {"~n~": 3}}
    {"a": "x"}    → {"~e~": 1, "a": {"~s~": "x"}}
    {"a": [1, 2]} → {"~e~": 1, "a": {"~a~": [{"~n~": 1}, {"~n~": 2}]}}

Suffix keys: ``~b~`` boolean, ``~n~`` number, ``~s~`` string, ``~a~``
nested array, ``~e~`` object-exists counter. DEVIATION from the
reference: its array suffix is ``~N~``, which collides with ``~n~``
under Spark's default case-INsensitive column resolution
(COLUMN_ALREADY_EXISTS on schema merge) — so this engine stores arrays
at ``~a~``; the query-time scalar-or-array normalization keeps the
``~N~`` name for its jx-facing semantics. A field that is a number in
one doc and a string in another lands at DIFFERENT encoded paths
(``a.~n~`` vs ``a.~s~``), so schema merge unions them instead of
conflicting — exactly the property Spark's JSON schema inference needs
for ragged corpora (test_typed_encoding proves the merged read).

JSON ``null`` is dropped (the reference's missing-singleton semantics:
absent and null are the same non-value). Scalars-vs-array duality is
the ``~N~`` half that :func:`operators.nested.normalize_to_array`
already handles at query time; this module is the STORAGE half.

The walk is per-doc recursive and schema-free, so it runs as an
Arrow-batched pandas UDF (the reference encodes per-doc in Python too;
ours is vectorized over batches). It is an ingest-edge op — downstream
queries stay JVM-side on the encoded JSON via get_json_object /
variant_get.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd

from pyspark.sql import Column, functions as F

BOOLEAN, NUMBER, STRING, ARRAY, EXISTS = "~b~", "~n~", "~s~", "~a~", "~e~"

# Readback schema for the single-key typed-encoding corpus the two
# registered typed_encoding_* queries build (one scalar/array value
# under "v"): ONE from_json against this serves all four typed paths
# (r13 opt, guide §4.1). Shared constant so the twin queries cannot
# drift (ADVICE r13). NOTE from_json runs in PERMISSIVE mode: a
# per-field type mismatch (e.g. a non-integral ~n~ under the bigint
# field) nulls the ENTIRE parsed record, not just the offending path —
# safe here because the engine's own encoders emit integral numbers
# and one typed key per row, but load-bearing if the encoding ever
# carries non-integral numerics (widen ~n~ before relying on it).
TYPED_READBACK_SCHEMA = ("v struct<`~s~` string, `~n~` bigint, "
                         "`~a~` array<struct<`~n~` bigint>>>, `~e~` int")


def encode_value(v: Any) -> Any:
    """Python-side typed encoding of one JSON value (bools before ints:
    bool is an int subclass)."""
    if isinstance(v, bool):
        return {BOOLEAN: v}
    if isinstance(v, (int, float)):
        return {NUMBER: v}
    if isinstance(v, str):
        return {STRING: v}
    if isinstance(v, list):
        return {ARRAY: [encode_value(e) for e in v if e is not None]}
    if isinstance(v, dict):
        out: dict[str, Any] = {EXISTS: 1}
        for k, val in v.items():
            if val is not None:
                out[k] = encode_value(val)
        return out
    raise TypeError(f"not a JSON value: {type(v)}")


def decode_value(v: Any) -> Any:
    """Inverse walk: strip suffix keys, rebuild the original doc."""
    if isinstance(v, dict):
        for t in (BOOLEAN, NUMBER, STRING):
            if t in v:
                return v[t]
        if ARRAY in v:
            return [decode_value(e) for e in v[ARRAY]]
        return {k: decode_value(val) for k, val in v.items() if k != EXISTS}
    return v


def typed_encode_json(col: Column | str) -> Column:
    """Column op: raw JSON string → typed-encoded JSON string."""
    @F.pandas_udf("string")
    def _enc(s: pd.Series) -> pd.Series:
        return s.map(lambda x: None if x is None
                     else json.dumps(encode_value(json.loads(x)),
                                     separators=(",", ":")))

    return _enc(F.col(col) if isinstance(col, str) else col)


def typed_encode_compiled(col: Column | str, schema) -> Column:
    """Schema-KNOWN typed encoding as pure Column expressions (codegen).

    ``typed_encode_json`` walks each doc in Python (Arrow-batched, but the
    body is interpreted per document) because it must handle ANY shape. At
    100 TB ingest that UDF is the throughput ceiling — but most real
    sources have a known per-source schema, and given a ``StructType`` (or
    DDL string) the whole suffix-key rewrite compiles to
    ``from_json`` → nested ``struct``/``transform`` → ``to_json``: all
    JVM-side, whole-stage-codegen'd, zero Python in the hot path. The UDF
    stays as the schemaless fallback.

    Byte-identical to the UDF path for docs matching the schema (field
    order follows the schema, suffix-first like the Python walk; ``to_json``
    omits null struct fields exactly where the walk drops JSON nulls —
    proven in test_typed_encoding). Caveats: input must parse under the
    schema (from_json yields NULL for malformed docs, where the UDF would
    raise); doc key order must match schema order for byte-equality (path
    values are always equal); and numbers render AS THE SCHEMA TYPE — a
    JSON ``3`` under a double field renders ``3.0`` (it IS a double once
    parsed), where the schemaless walk keeps ``3``.
    """
    from pyspark.sql import types as T

    raw = F.col(col) if isinstance(col, str) else col
    st = T.StructType.fromDDL(schema) if isinstance(schema, str) else schema

    def enc(c: Column, dt: T.DataType) -> Column:
        """Encoded form of a non-null value of type ``dt``."""
        if isinstance(dt, T.BooleanType):
            return F.struct(c.alias(BOOLEAN))
        if isinstance(dt, T.NumericType):
            return F.struct(c.alias(NUMBER))
        if isinstance(dt, T.StringType):
            return F.struct(c.alias(STRING))
        if isinstance(dt, T.ArrayType):
            return F.struct(
                F.transform(F.filter(c, lambda x: x.isNotNull()),
                            lambda x: enc(x, dt.elementType)).alias(ARRAY))
        if isinstance(dt, T.StructType):
            return F.struct(
                F.lit(1).alias(EXISTS),
                *[F.when(c[f.name].isNotNull(),
                         enc(c[f.name], f.dataType)).alias(f.name)
                  for f in dt.fields])
        raise TypeError(f"typed encoding: unsupported type {dt}")

    parsed = F.from_json(raw, st)
    return F.when(parsed.isNotNull(), F.to_json(enc(parsed, st)))


def typed_decode_json(col: Column | str) -> Column:
    """Column op: typed-encoded JSON string → original JSON string."""
    @F.pandas_udf("string")
    def _dec(s: pd.Series) -> pd.Series:
        return s.map(lambda x: None if x is None
                     else json.dumps(decode_value(json.loads(x)),
                                     separators=(",", ":")))

    return _dec(F.col(col) if isinstance(col, str) else col)

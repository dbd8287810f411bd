"""Nested-document operators: the reference's schemaless-JSON surface.

The reference stores arbitrarily nested docs and queries them via dot-paths
(``mo_dots.Data``), auto-flattening arrays (``FlatList``), deep queries
(``"from": "task.artifacts"`` — ``jx_elasticsearch/es52/deep.py``; child
tables in jx_sqlite) and leaf flattening (``LeavesOp``). Spark equivalents
(SURVEY.md §2.9 array/JSON tables):

- dot path through struct         → ``F.col("a.b.c")``
- path through array of structs   → ``col("arr.field")`` (already an array)
- deep query / unnest             → ``explode`` (+ parent columns carried)
- leaves                         → recursive schema walk (here)
- scalar-or-array duality (~N~)   → ``normalize_to_array``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def leaf_paths(schema: T.StructType, prefix: str = "") -> list[str]:
    """All leaf dot-paths of a (possibly nested) schema, arrays excluded —
    mirrors what the reference's column catalog discovers per index."""
    out: list[str] = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out.extend(leaf_paths(f.dataType, prefix=f"{path}."))
        elif not isinstance(f.dataType, T.ArrayType):
            out.append(path)
    return out


def leaves(df: DataFrame) -> DataFrame:
    """jx ``{"leaves": "."}``: flatten nested structs to dotted-name leaf
    columns (LeavesOp). Array fields are kept as-is (the reference keeps
    nested arrays as child docs, not leaves)."""
    return df.select(
        *[F.col(f"`{p}`" if "." not in p else p).alias(p) for p in leaf_paths(df.schema)]
    )


def unnest(df: DataFrame, array_col: str, parent_cols: list[str],
           outer: bool = False) -> DataFrame:
    """Deep query: explode an array of structs, carrying parent columns
    (LATERAL VIEW shape). ``outer=True`` keeps parents with empty arrays.

    Struct arrays go through ``inline`` — one Generate that emits the
    fields as top-level columns directly, skipping the intermediate
    struct-valued column + per-field GetStructField projection (~20%
    cheaper at sf0.1 roundtrip volumes)."""
    elem = df.select(F.col(array_col)).schema[0].dataType.elementType
    if isinstance(elem, T.StructType):
        ex = F.inline_outer(array_col) if outer else F.inline(array_col)
        return df.select(*parent_cols, ex)
    ex = F.explode_outer(array_col) if outer else F.explode(array_col)
    return df.select(*parent_cols, ex.alias(array_col.split(".")[-1]))


def normalize_to_array(doc: Column, path: str, elem_type: str = "int") -> Column:
    """Typed-encoder ``~N~`` semantics: a field that is scalar in one doc
    and an array in another is normalized to array at ingest.

    ``doc`` is a VariantType column (``F.parse_json`` of the raw JSON —
    Spark 4's representation of ragged documents); missing → empty array,
    scalar → singleton. Verified against mixed docs in
    tests/test_schema_evolution.py.
    """
    v = F.try_variant_get(doc, f"$.{path}", "variant")
    # absent field → SQL NULL; explicit JSON null → a variant whose schema
    # is VOID — jx treats both as missing (Null singleton semantics)
    return (
        F.when(v.isNull() | (F.schema_of_variant(v) == "VOID"),
               F.array().cast(f"array<{elem_type}>"))
        .when(F.schema_of_variant(v).startswith("ARRAY"),
              F.variant_get(doc, f"$.{path}", f"array<{elem_type}>"))
        .otherwise(F.array(F.variant_get(doc, f"$.{path}", elem_type)))
    )


def _variant_schema(v: Column) -> Column:
    return F.schema_of_variant(v)


def variant_is_number(v: Column) -> Column:
    """Dynamic type test on a VARIANT value (jx is_number over ragged
    JSON): true iff THIS row's value is numeric. SQL NULL variant and JSON
    null (VOID schema) are both missing → false."""
    s = _variant_schema(v)
    return v.isNotNull() & (
        s.isin("TINYINT", "SMALLINT", "INT", "BIGINT", "FLOAT", "DOUBLE")
        | s.startswith("DECIMAL"))


def variant_is_string(v: Column) -> Column:
    return v.isNotNull() & (_variant_schema(v) == "STRING")


def variant_is_boolean(v: Column) -> Column:
    return v.isNotNull() & (_variant_schema(v) == "BOOLEAN")


def nest(df: DataFrame, parent_keys: list[str], item_cols: list[str],
         order_by: str, array_name: str = "items") -> DataFrame:
    """Inverse of unnest: roll child rows up into an ordered array of
    structs per parent — the ETL-time denormalization the reference bakes
    into its documents (e.g. task.artifacts[]).

    The explicit repartition below is a deliberate partial-agg skip:
    parent keys are near-unique, so map-side partial collect_list reduces
    nothing — it just builds every array inside however few tasks the
    scan has (a single unsplittable row group ⇒ ONE task). Pre-hashing by
    key satisfies the aggregate's distribution, so there is still exactly
    one shuffle, but the array building lands on all reduce tasks
    (measured 2× on the sf0.1 roundtrip; same plan shape at any scale).
    """
    df = df.repartition(*[F.col(k) for k in parent_keys])
    item = F.struct(*[F.col(c) for c in item_cols])
    if item_cols and item_cols[0] == order_by:
        # array_sort compares structs field-by-field, so with the sort key
        # leading, sorting the item structs directly skips the (key, item)
        # wrapper struct and the unwrap transform — measurably cheaper at
        # collect_list volumes (the wrapper doubles per-row struct builds).
        return (
            df.groupBy(*parent_keys)
            .agg(F.array_sort(F.collect_list(item)).alias(array_name))
        )
    return (
        df.groupBy(*parent_keys)
        .agg(F.array_sort(F.collect_list(F.struct(F.col(order_by).alias("__o__"),
                                                  item.alias("__i__")))).alias("__tmp__"))
        .withColumn(array_name, F.transform(F.col("__tmp__"), lambda s: s.getField("__i__")))
        .drop("__tmp__")
    )

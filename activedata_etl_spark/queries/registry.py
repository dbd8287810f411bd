"""Registry mapping query names → (PySpark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 marked [Q] registers here via the
:func:`query` decorator; ``__spark_entry__.py`` exposes the dicts to the
verify driver. Column names of computed outputs MUST match between the
Spark plan and the oracle SQL (the driver sorts columns by name before
value-hashing).
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a query; ``oracle=None`` → driver does a rows-only check
    (reserved for non-SQL-expressible ops: LSH near-dup, multimodal)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        assert name not in QUERIES, f"duplicate query name: {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco

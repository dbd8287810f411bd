"""Query catalog: importing this package registers every query/oracle pair.

Module per SURVEY.md §2 area; each import populates
``registry.QUERIES`` / ``registry.ORACLES`` via decorator side effects.
"""

from . import (  # noqa: F401
    q_aggs,
    q_aggs2,
    q_edges,
    q_events,
    q_expr,
    q_ext,
    q_ext2,
    q_ext3,
    q_flagship,
    q_joins,
    q_jx,
    q_misc,
    q_nested,
    q_sampling,
    q_setops_sort,
    q_tpch,
    q_tpch2,
    q_windows,
)
from .registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]

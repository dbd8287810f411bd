"""Query catalog: importing this package registers every query/oracle pair.

Module per SURVEY.md §2 area; each import populates
``registry.QUERIES`` / ``registry.ORACLES`` via decorator side effects.
"""

from . import q_expr, q_flagship  # noqa: F401
from .registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]

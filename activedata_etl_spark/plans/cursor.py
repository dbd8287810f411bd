"""Keyset ("cursor") pagination — the deep-paging path the offset form
degenerates on.

``skip``/``limit`` paging lowers to one distributed top-(skip+limit)
per page: page 10,000 of a 100 TB result re-sorts everything above it.
The reference's guidance (and every production jx deployment's) is a
sort-key predicate cursor: remember the last row's sort-key values and
ask for rows strictly AFTER them. This module builds that predicate AS
A JX EXPRESSION DICT, so it composes with the client's own ``where``
and rides the ordinary compile path — Catalyst pushes it into the
parquet scan (``PushedFilters``), which is what makes page 10,000 cost
the same as page 1.

Ordering semantics match ``plans/query._sort_col`` exactly:
ascending = ``asc_nulls_first`` (jx missing-first), descending =
``desc_nulls_last``. "Strictly after" per key, given boundary value v:

- asc,  v non-null: ``gt`` (null keys sort first, so they are before —
  jx gt's missing=false semantics already exclude them)
- asc,  v null:     ``exists`` (every non-null is after null)
- desc, v non-null: ``lt`` OR ``missing`` (nulls sort LAST in desc)
- desc, v null:     nothing is after the trailing nulls → constant false

Tie-break chains through null-safe equality (jx ``eq`` IS null-safe;
``missing`` covers the null boundary). CONTRACT: the sort spec must be
a TOTAL order (include a unique key last) — with duplicate full sort
keys at a page boundary, keyset pagination skips or repeats the
duplicates, the standard caveat of the technique.
"""

from __future__ import annotations

from typing import Any


def normalize_sorts(sort) -> list[tuple[str, int]]:
    """jx sort clause → [(column, ±1)]. Raises if any sort value is not
    a plain column name — a cursor needs to read the boundary values
    back out of the result rows, so computed sort keys must be given a
    name via select first."""
    entries = sort if isinstance(sort, list) else [sort]
    out: list[tuple[str, int]] = []
    for s in entries:
        if isinstance(s, str):
            out.append((s, 1))
        elif isinstance(s, dict) and isinstance(s.get("value"), str):
            out.append((s["value"], -1 if s.get("sort", 1) == -1 else 1))
        else:
            raise ValueError(
                "cursor paging requires plain-column sort keys "
                f"(got {s!r}); alias computed keys through select first")
    return out


def _after_term(col: str, v: Any, direction: int) -> dict | None:
    """Strictly-after predicate for one key; None means constant FALSE
    (nothing sorts after a trailing-null boundary in descending order)."""
    if direction == 1:
        if v is None:
            return {"exists": col}
        return {"gt": {col: v}}
    if v is None:
        return None
    return {"or": [{"lt": {col: v}}, {"missing": col}]}


def _eq_term(col: str, v: Any) -> dict:
    return {"missing": col} if v is None else {"eq": {col: v}}


def cursor_predicate(sorts: list[tuple[str, int]],
                     after: list[Any]) -> dict:
    """The keyset predicate: OR over i of (keys < i equal their
    boundary values) AND (key i strictly after its boundary value)."""
    if len(after) != len(sorts):
        raise ValueError(
            f"cursor carries {len(after)} values for {len(sorts)} sort keys")
    branches: list[dict] = []
    for i, (col, direction) in enumerate(sorts):
        term = _after_term(col, after[i], direction)
        if term is None:
            continue  # constant-false branch
        eqs = [_eq_term(c, after[j]) for j, (c, _) in enumerate(sorts[:i])]
        branches.append({"and": [*eqs, term]} if eqs else term)
    if not branches:
        # boundary is the absolute end of the ordering: empty page
        return {"and": [{"missing": sorts[0][0]}, {"exists": sorts[0][0]}]}
    return branches[0] if len(branches) == 1 else {"or": branches}


def advance(sorts: list[tuple[str, int]], last_row: dict) -> list[Any]:
    """Boundary values for the NEXT page from the last returned row.
    Raises if a sort column was projected away — the cursor contract
    requires the sort keys in the output."""
    missing = [c for c, _ in sorts if c not in last_row]
    if missing:
        raise ValueError(
            f"cursor paging requires sort columns in the output; "
            f"missing: {missing}")
    vals = [last_row[c] for c, _ in sorts]
    for v in vals:
        if not (v is None or isinstance(v, (int, float, str, bool))):
            raise ValueError(
                f"cursor values must be JSON-native scalars; got "
                f"{type(v).__name__} — cast the sort key in select "
                "(e.g. epoch millis for timestamps)")
    return vals

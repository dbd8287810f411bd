"""Output formats: list | table | cube.

The reference returns query results in three shapes
(``vendor/jx_python/containers/cube.py``, ``mo_collections/matrix.py``):

- ``list``:  [{col: val, ...}, ...]
- ``table``: {"header": [...], "data": [[...], ...]}
- ``cube``:  {"edges": [...], "data": {select: N-dim nested lists}}

These are client-side PRESENTATIONS of the result (SURVEY.md §1.3): the
distributed engine's output is the DataFrame; formatting collects it,
so it is only for final, human-sized results — never a stage in a
pipeline.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def to_list(df: DataFrame) -> list[dict[str, Any]]:
    return [row.asDict(recursive=True) for row in df.collect()]


def to_table(df: DataFrame) -> dict[str, Any]:
    cols = df.columns
    return {"header": cols, "data": [[row[c] for c in cols] for row in df.collect()]}


#: Refusal bound for driver-side cube materialization: the service's row
#: cap guards HTTP callers, but a library caller composing dense edges
#: could otherwise collect an unbounded cell grid onto the driver
#: (VERDICT r7 #2). 1M cells ≈ tens of MB of Python dicts — generous for
#: a human-sized cube, far below driver-OOM territory.
MAX_CUBE_CELLS = 1_000_000


def to_cube(df: DataFrame, edge_names: list[str],
            select_names: list[str],
            max_cells: int | None = MAX_CUBE_CELLS) -> dict[str, Any]:
    """Dense N-dim cube: one axis per edge (parts = sorted distinct
    values), one value matrix per select, None for absent cells.

    ``max_cells`` bounds the driver-side collect: the fetch itself is
    LIMIT-bounded (never pulls more than ``max_cells + 1`` rows), and
    exceeding the bound raises with the remedies instead of truncating
    silently."""
    if max_cells is not None:
        rows = df.limit(max_cells + 1).collect()
        if len(rows) > max_cells:
            raise ValueError(
                f"cube materialization exceeds {max_cells} cells; cap the"
                " edge domains (domain.limit), add where/limit clauses,"
                " or extract with format=stream/arrow-stream instead")
    else:
        rows = df.collect()
    axes = [sorted({row[e] for row in rows}, key=lambda v: (v is None, v))
            for e in edge_names]
    index = [{v: i for i, v in enumerate(ax)} for ax in axes]

    def empty(dims: list[int]):
        if not dims:
            return None
        return [empty(dims[1:]) for _ in range(dims[0])]

    dims = [len(ax) for ax in axes]
    data = {s: empty(dims) for s in select_names}
    for row in rows:
        for s in select_names:
            cell = data[s]
            for d, e in enumerate(edge_names[:-1]):
                cell = cell[index[d][row[e]]]
            if dims:
                cell[index[-1][row[edge_names[-1]]]] = row[s]
            else:
                data[s] = row[s]
    return {
        "edges": [{"name": e, "domain": {"partitions": axes[i]}}
                  for i, e in enumerate(edge_names)],
        "data": data,
    }

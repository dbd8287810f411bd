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


def to_cube(df: DataFrame, edge_names: list[str],
            select_names: list[str]) -> dict[str, Any]:
    """Dense N-dim cube: one axis per edge (parts = sorted distinct
    values), one value matrix per select, None for absent cells."""
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

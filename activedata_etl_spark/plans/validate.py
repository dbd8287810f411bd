"""Pre-flight jx query validation with POSITION info.

The reference's service answers a malformed query with a structured
error naming the offending clause, not a stack trace. This walks the
query JSON before planning and returns ``[{path, reason}, ...]`` —
``path`` is the jx location ("edges[0].domain.type",
"select[1].aggregate", "where.eeq") so a client can highlight the exact
clause. Planning errors that slip past (unknown table, type errors)
still surface as 400s from the planner; this layer catches shape
errors cheaply and precisely.
"""

from __future__ import annotations

from typing import Any

_CLAUSES = {
    "from", "select", "where", "edges", "groupby", "window", "sort",
    "limit", "skip", "format", "meta", "name", "cursor",
}
_FORMATS = {"list", "table", "cube", "explain", "stream", "arrow",
            "arrow-stream"}
_DOMAIN_TYPES = {"default", "set", "range", "time", "duration"}
# expression-dict keys that are op MODIFIERS, not ops (mirrors
# expressions._single_op)
_EXPR_EXTRAS = {"default", "separator", "start", "digits", "percentile",
                "then", "else", "offset"}


def _expr_ops() -> set:
    from .expressions import _OPS

    return set(_OPS)


def _listify(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _walk_expr(e: Any, path: str, errs: list[dict]) -> None:
    if not isinstance(e, dict):
        return  # strings / numbers / None are always shape-valid
    if "literal" in e and len(e) == 1:
        return
    ops = [k for k in e if k not in _EXPR_EXTRAS]
    if len(ops) != 1:
        errs.append({"path": path,
                     "reason": f"expected exactly one op key, got {sorted(e)}"})
        return
    op = ops[0]
    if op not in _expr_ops():
        errs.append({"path": f"{path}.{op}", "reason": f"unknown jx op {op!r}"})
        return
    args = e[op]
    if isinstance(args, list):
        for j, a in enumerate(args):
            _walk_expr(a, f"{path}.{op}[{j}]", errs)
    elif isinstance(args, dict) and op in ("when", "not"):
        _walk_expr(args, f"{path}.{op}", errs)
    for mod in ("then", "else"):
        if mod in e:
            _walk_expr(e[mod], f"{path}.{mod}", errs)


def validate(q: Any) -> list[dict]:
    """Shape-check a jx query dict; [] means plan-able."""
    if not isinstance(q, dict):
        return [{"path": ".", "reason": "query must be a JSON object"}]
    errs: list[dict] = []
    for k in q:
        if k not in _CLAUSES:
            errs.append({"path": k, "reason": f"unknown clause {k!r}"})
    if "from" not in q:
        errs.append({"path": "from", "reason": "required clause is missing"})
    elif isinstance(q["from"], dict) and "op" in q["from"]:
        from .extensions import op_names

        if q["from"]["op"] not in op_names():
            errs.append({"path": "from.op",
                         "reason": f"unknown extension op {q['from']['op']!r};"
                                   f" one of {sorted(op_names())}"})
        elif "table" not in q["from"]:
            errs.append({"path": "from.table",
                         "reason": "extension op needs a source 'table'"})
    fmt = q.get("format", "list")
    if fmt not in _FORMATS:
        errs.append({"path": "format",
                     "reason": f"unknown format {fmt!r}; one of {sorted(_FORMATS)}"})
    if "skip" in q:
        if not isinstance(q["skip"], int) or q["skip"] < 0:
            errs.append({"path": "skip",
                         "reason": "skip must be a non-negative integer"})
        if "sort" not in q:
            errs.append({"path": "skip",
                         "reason": "skip-paging requires an explicit sort "
                                   "(page boundaries are undefined otherwise)"})
    if "limit" in q and (not isinstance(q["limit"], int) or q["limit"] < 0):
        errs.append({"path": "limit",
                     "reason": "limit must be a non-negative integer"})
    if "cursor" in q:
        cur = q["cursor"]
        if not (cur is True or (isinstance(cur, dict)
                                and isinstance(cur.get("after"), list))):
            errs.append({"path": "cursor",
                         "reason": "cursor must be true (first page) or "
                                   '{"after": [...]} from meta.cursor'})
        if "sort" not in q:
            errs.append({"path": "cursor",
                         "reason": "cursor paging requires an explicit sort "
                                   "(use a totally-ordering key list)"})
        if "skip" in q:
            errs.append({"path": "cursor",
                         "reason": "cursor and skip are mutually exclusive "
                                   "paging modes"})
        if q.get("format", "list") not in ("list", "table", "explain"):
            errs.append({"path": "cursor",
                         "reason": "cursor paging supports list/table "
                                   "(and explain for plan probes)"})

    from .query import _AGG_NAMES

    for i, s in enumerate(_listify(q.get("select"))):
        if not isinstance(s, dict):
            continue
        agg = s.get("aggregate")
        if agg is not None and agg not in _AGG_NAMES:
            errs.append({"path": f"select[{i}].aggregate",
                         "reason": f"unknown aggregate {agg!r}"})
        if "value" in s:
            _walk_expr(s["value"], f"select[{i}].value", errs)
    if "where" in q:
        _walk_expr(q["where"], "where", errs)
    for clause in ("edges", "groupby"):
        for i, e in enumerate(_listify(q.get(clause))):
            if not isinstance(e, dict):
                continue
            if "value" in e:
                _walk_expr(e["value"], f"{clause}[{i}].value", errs)
            dom = e.get("domain")
            if isinstance(dom, dict) and dom.get("type") not in _DOMAIN_TYPES:
                errs.append({"path": f"{clause}[{i}].domain.type",
                             "reason": f"unknown domain type {dom.get('type')!r}; "
                                       f"one of {sorted(_DOMAIN_TYPES)}"})
    for i, w in enumerate(_listify(q.get("window"))):
        if isinstance(w, dict) and "name" not in w:
            errs.append({"path": f"window[{i}].name",
                         "reason": "window clause needs a name"})
    return errs

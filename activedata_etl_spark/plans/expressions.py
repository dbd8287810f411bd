"""jx expression JSON → Spark Column compiler.

The reference normalizes query JSON into an expression tree
(``vendor/jx_base/expressions.py``: one class per op, ``partial_eval`` for
simplification) and lowers it per backend (``jx_python/expressions.py``
compiles to Python source; ``es52/expressions.py`` to ES DSL/Painless).
This module is the Spark lowering: JSON in, Column out, with the jx
conventions:

- bare strings are VARIABLES (dot-paths); literals are wrapped:
  ``{"literal": "x"}`` (string) vs ``"x"`` (column reference)
- numbers/booleans are literals
- ``{"op": args}`` where args may be a value, a pair list, or an
  op-specific clause dict
- null semantics come from ``functions/jx.py`` (null-safe eq,
  null-ignoring add/mult, safe div, …) — NOT plain SQL operators

Constant folding / simplification is deliberately left to Catalyst — the
reference needed ``partial_eval`` because it generated interpreted Python;
Catalyst does this at the logical-plan level for free (SURVEY.md §4.1).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, functions as F

from ..functions import jx

_L = "literal"

_UNESC_DOT = re.compile(r"(?<!\\)\.")  # a dot NOT preceded by a backslash


def split_path(name: str) -> list[str]:
    r"""Split a jx dot-path honoring mo_dots escapes: ``a.b`` is two
    steps, ``a\.b`` is ONE name containing a literal dot (SURVEY §1.1).
    Each returned segment is unescaped."""
    return [p.replace("\\.", ".") for p in _UNESC_DOT.split(name)]


def variable(name: str) -> Column:
    r"""Resolve a jx variable (dot-path) to a Column. Segments carrying a
    literal dot (written ``a\.b``) resolve via backticks, so a column
    NAMED ``a.b`` and a struct traversal ``a.b`` are distinct — the
    mo_dots distinction Spark expresses with quoting."""
    if "\\." not in name:
        return F.col(name)
    return F.col(".".join(f"`{p}`" if "." in p else p
                          for p in split_path(name)))


def compile_expr(e: Any) -> Column:
    """Compile a jx expression JSON value to a Column."""
    if isinstance(e, bool | int | float):
        return F.lit(e)
    if e is None:
        return F.lit(None)
    if isinstance(e, str):
        return F.lit(None) if e == "null" else variable(e)
    if isinstance(e, dict):
        if _L in e and len(e) == 1:
            return F.lit(e[_L])
        op, args = _single_op(e)
        fn = _OPS.get(op)
        if fn is None:
            raise ValueError(f"unknown jx op: {op!r}")
        return fn(args, e)
    raise ValueError(f"cannot compile jx expression: {e!r}")


def _single_op(e: dict) -> tuple[str, Any]:
    ops = [k for k in e if k not in ("default", "separator", "start",
                                     "digits", "percentile",
                                     "then", "else", "offset")]
    if len(ops) != 1:
        raise ValueError(f"expected exactly one op key in {e!r}")
    return ops[0], e[ops[0]]


def _pair(args) -> tuple[Column, Column]:
    a, b = args
    return compile_expr(a), compile_expr(b)


def _many(args) -> list[Column]:
    return [compile_expr(a) for a in (args if isinstance(args, list) else [args])]


def _eq_like(args, combine):
    """eq/ne accept pair form ["a", 1] or clause form {"a": 1, "b": 2}."""
    if isinstance(args, dict):
        # compile the variable side like every other op (dotted jx paths,
        # names needing resolution), not a bare F.col
        cols = [combine(compile_expr(k), F.lit(v)) for k, v in args.items()]
        out = cols[0]
        for c in cols[1:]:
            out = out & c
        return out
    return combine(*_pair(args))


def _cmp(op):
    def run(args, _e):
        if isinstance(args, dict):  # clause form {"lt": {"x": 5}}
            (k, v), = args.items()
            a, b = compile_expr(k), F.lit(v)
        else:
            a, b = _pair(args)
        return {"gt": a > b, "gte": a >= b, "lt": a < b, "lte": a <= b}[op]

    return run


def _when(args, e):
    then = compile_expr(e.get("then")) if "then" in e else F.lit(None)
    els = compile_expr(e.get("else")) if "else" in e else F.lit(None)
    return F.when(compile_expr(args), then).otherwise(els)


def _case(args, _e):
    branches = []
    default = F.lit(None)
    for clause in args:
        if isinstance(clause, dict) and "when" in clause:
            branches.append((compile_expr(clause["when"]), compile_expr(clause.get("then"))))
        else:
            default = compile_expr(clause)  # trailing default
    out = None
    for cond, val in branches:
        out = (F.when if out is None else out.when)(cond, val)
    return out.otherwise(default) if out is not None else default


def _in(args, _e):
    if isinstance(args, dict):  # clause form {"in": {"x": [1, 2]}}
        (var, values), = args.items()
    else:
        var, values = args
    return compile_expr(var).isin(*(values if isinstance(values, list) else [values]))


_DURATION_UNITS = {"year", "quarter", "month", "week", "day",
                   "hour", "minute", "second"}


def _floor(a):
    """FloorOp: numeric floor-to-multiple, or — when the interval is a
    duration name — date flooring (the reference's ``date.floor(WEEK)``,
    month-aware): {"floor": ["ts", "month"]} → date_trunc."""
    if isinstance(a, list):
        v, interval = a
        if isinstance(interval, str) and interval.lower() in _DURATION_UNITS:
            return F.date_trunc(interval.lower(), compile_expr(v))
        return jx.floor(compile_expr(v), interval)
    return jx.floor(compile_expr(a))


def _find(args, e):
    s, sub = args
    return jx.find(compile_expr(s), sub, start=e.get("start", 0))


def _between(args, e):
    if isinstance(args, dict):  # {"between": {"v": [pre, suf]}}
        (var, (pre, suf)), = args.items()
        return jx.between(F.col(var), pre, suf)
    v, pre, suf = args
    return jx.between(compile_expr(v), pre, suf)


def _string_n(fn):
    def run(args, _e):
        s, n = args
        return fn(compile_expr(s), n)

    return run


def _prefix_like(fn):
    def run(args, _e):
        if isinstance(args, dict):
            (var, lit), = args.items()
            return fn(F.col(var), lit)
        s, p = args
        p = p[_L] if isinstance(p, dict) else p
        return fn(compile_expr(s), p)

    return run


_OPS = {
    # predicates
    "eq": lambda a, _e: _eq_like(a, jx.eq),
    "ne": lambda a, _e: _eq_like(a, jx.ne),
    "gt": _cmp("gt"), "gte": _cmp("gte"), "lt": _cmp("lt"), "lte": _cmp("lte"),
    "and": lambda a, _e: jx.and_(*_many(a)),
    "or": lambda a, _e: jx.or_(*_many(a)),
    "not": lambda a, _e: jx.not_(compile_expr(a)),
    "in": _in,
    "missing": lambda a, _e: jx.missing(compile_expr(a)),
    "exists": lambda a, _e: jx.exists(compile_expr(a)),
    "coalesce": lambda a, _e: jx.coalesce(*_many(a)),
    "when": _when,
    "case": _case,
    "prefix": _prefix_like(jx.prefix),
    "suffix": _prefix_like(jx.suffix),
    "regex": _prefix_like(jx.regex),
    "regexp": _prefix_like(jx.regex),
    # math (jx null semantics)
    "add": lambda a, e: jx.add(*_many(a), default=e.get("default")),
    "sum": lambda a, e: jx.add(*_many(a), default=e.get("default")),
    "sub": lambda a, _e: jx.sub(*_pair(a)),
    "subtract": lambda a, _e: jx.sub(*_pair(a)),
    "minus": lambda a, _e: jx.sub(*_pair(a)),
    "mult": lambda a, e: jx.mult(*_many(a), default=e.get("default")),
    "multiply": lambda a, e: jx.mult(*_many(a), default=e.get("default")),
    "div": lambda a, e: jx.div(*_pair(a), default=e.get("default")),
    "divide": lambda a, e: jx.div(*_pair(a), default=e.get("default")),
    "mod": lambda a, _e: jx.mod(*_pair(a)),
    "floor": lambda a, _e: _floor(a),
    "round": lambda a, e: jx.round_(compile_expr(a), e.get("digits", 0)),
    "abs": lambda a, _e: jx.abs_(compile_expr(a)),
    "exp": lambda a, _e: jx.power(*_pair(a)),
    "max": lambda a, _e: jx.max_(*_many(a)),
    "min": lambda a, _e: jx.min_(*_many(a)),
    "number": lambda a, _e: jx.to_number(compile_expr(a)),
    "integer": lambda a, _e: jx.to_integer(compile_expr(a)),
    "boolean": lambda a, _e: jx.to_boolean(compile_expr(a)),
    "string": lambda a, _e: jx.to_string(compile_expr(a)),
    # strings
    "length": lambda a, _e: jx.length(compile_expr(a)),
    "left": _string_n(jx.left),
    "right": _string_n(jx.right),
    "not_left": _string_n(jx.not_left),
    "not_right": _string_n(jx.not_right),
    "concat": lambda a, e: jx.concat(e.get("separator", ""), *_many(a)),
    "find": _find,
    "between": _between,
    "split": lambda a, _e: jx.split(compile_expr(a[0]), a[1]),
    "upper": lambda a, _e: jx.upper(compile_expr(a)),
    "lower": lambda a, _e: jx.lower(compile_expr(a)),
    "trim": lambda a, _e: jx.trim(compile_expr(a)),
    # structure
    "is_number": lambda a, _e: jx.is_number(compile_expr(a)),
    "is_string": lambda a, _e: jx.is_string(compile_expr(a)),
    "is_boolean": lambda a, _e: jx.is_boolean(compile_expr(a)),
    "union": lambda a, _e: jx.union_values(*_many(a)),
    "get": lambda a, _e: jx.get(compile_expr(a[0]), a[1]),
    "tuple": lambda a, _e: jx.tuple_(*_many(a)),
    "leaves": lambda a, _e: F.col("*") if a == "." else F.col(a),
    "script": lambda a, _e: jx.script(a),
    "date": lambda a, _e: _date_lit(a),
}


def _date_lit(a) -> Column:
    """jx date literal incl. relative forms ("today-week"); resolved at
    plan time (mo_times/dates.py parse). Relative forms read the real
    clock — deterministic tests/oracles must pass absolute dates or use
    functions.dates.date_lit with an injected now."""
    from ..functions.dates import date_lit

    return date_lit(a)

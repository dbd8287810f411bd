"""jx ("JSON expressions") scalar operator semantics as Column builders.

The reference's expression algebra lives in ``vendor/jx_base/expressions.py``
(one class per op: EqOp, NeOp, AddOp, DivOp, FloorOp, FindOp, BetweenOp, …)
with per-backend lowerings in ``vendor/jx_python/expressions.py`` and
``vendor/jx_elasticsearch/es52/expressions.py``. This module is the Spark
lowering: each function returns a Column expression built ONLY from
``pyspark.sql.functions`` so the whole kit stays inside Catalyst/whole-stage
codegen — no Python UDFs anywhere.

⚠️ jx null semantics are NOT SQL three-valued logic (SURVEY.md §7.5):

- ``eq`` is null-safe: eq(missing, missing) = true.
- ``ne`` is true only when BOTH operands exist and differ.
- variadic ``add``/``mult``/``max``/``min`` IGNORE missing operands
  (SQL ``+`` null-poisons); all-missing → missing (or ``default``).
- ``div`` by zero → missing, never an error.
- ``mod`` is floored (Python convention), not truncating SQL ``%``.
- ``find`` returns missing when absent (never -1), 0-based when found.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, functions as F


def _c(x) -> Column:
    """Promote strings to columns and Python literals to lit()."""
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


# --- predicates (jx_base/expressions.py :: EqOp, NeOp, InequalityOp, ...) ---

def eq(a, b) -> Column:
    """Null-safe equality: eq(missing, missing) is TRUE (EqOp)."""
    return _c(a).eqNullSafe(_c(b))


def ne(a, b) -> Column:
    """TRUE only when both exist and differ (NeOp) — not SQL ``<>``."""
    a, b = _c(a), _c(b)
    return a.isNotNull() & b.isNotNull() & (a != b)


def missing(a) -> Column:
    return _c(a).isNull()


def exists(a) -> Column:
    return _c(a).isNotNull()


def and_(*xs) -> Column:
    """AND where missing operands are treated as FALSE (AndOp)."""
    out = F.lit(True)
    for x in xs:
        out = out & F.coalesce(_c(x), F.lit(False))
    return out


def or_(*xs) -> Column:
    out = F.lit(False)
    for x in xs:
        out = out | F.coalesce(_c(x), F.lit(False))
    return out


def not_(x) -> Column:
    """NOT with missing → TRUE is jx's "missing is false" (NotOp)."""
    return ~F.coalesce(_c(x), F.lit(False))


def in_(x, values: Sequence) -> Column:
    return _c(x).isin(*values)


def prefix(s, p: str) -> Column:
    return _c(s).startswith(p)


def suffix(s, p: str) -> Column:
    return _c(s).endswith(p)


def regex(s, pattern: str) -> Column:
    """FULL-string regex match (RegExpOp) — anchored, unlike SQL rlike."""
    return _c(s).rlike(f"^(?:{pattern})$")


def coalesce(*xs) -> Column:
    return F.coalesce(*[_c(x) for x in xs])


def when(cond, then, els=None) -> Column:
    return F.when(_c(cond), _c(then)).otherwise(_c(els))


def case(*branches, default=None) -> Column:
    """First matching (cond, value) pair, else default (CaseOp)."""
    out = None
    for cond, value in branches:
        out = (F.when if out is None else out.when)(_c(cond), _c(value))
    return out.otherwise(_c(default))


# --- arithmetic (AddOp, MultOp, DivOp, ModOp, FloorOp, ...) ---

def add(*xs, default=None) -> Column:
    """Null-IGNORING variadic sum; all-missing → default (AddOp/SumOp).

    SQL ``a + b`` null-poisons; jx treats missing operands as absent.
    """
    cols = [_c(x) for x in xs]
    # init with a BIGINT zero: int32 operands promote to bigint (a
    # product/sum of realistic counts overflows int32 and ANSI mode
    # makes that an ERROR, not a wrap — found by the widened numeric
    # fuzzer); double operands promote the whole expression to double.
    # Overflow beyond bigint is out of contract (the reference's Python
    # ints were arbitrary-precision; no fixed-width engine can match).
    total = F.lit(0).cast("bigint")
    any_present = F.lit(False)
    for c in cols:
        total = total + F.coalesce(c, F.lit(0))
        any_present = any_present | c.isNotNull()
    return F.when(any_present, total).otherwise(_c(default))


def mult(*xs, default=None) -> Column:
    """Null-ignoring variadic product (MultOp)."""
    cols = [_c(x) for x in xs]
    prod = F.lit(1).cast("bigint")  # int32-overflow guard, see add()
    any_present = F.lit(False)
    for c in cols:
        prod = prod * F.coalesce(c, F.lit(1))
        any_present = any_present | c.isNotNull()
    return F.when(any_present, prod).otherwise(_c(default))


def sub(a, b) -> Column:
    """a - b; missing if either missing (SubOp)."""
    return _c(a) - _c(b)


def div(a, b, default=None) -> Column:
    """a / b with divide-by-zero → missing/default, never an error (DivOp)."""
    a, b = _c(a), _c(b)
    return F.when(b == 0, _c(default)).otherwise(a / b)


def mod(a, b) -> Column:
    """Floored modulo (Python convention): mod(-7, 3) = 2 (ModOp).

    Spark's ``%`` truncates (-7 % 3 = -1); ``pmod`` matches jx.
    """
    return F.pmod(_c(a), _c(b))


def floor(x, interval=1) -> Column:
    """Floor to a multiple of ``interval`` (FloorOp): largest multiple ≤ x.

    jx numbers are unified doubles, so the result is double.
    """
    x, i = _c(x), _c(interval)
    return (F.floor(x / i) * i).cast("double")


def round_(x, digits: int = 0) -> Column:
    """Round half-away-from-zero (RoundOp) — F.round, never bround."""
    return F.round(_c(x), digits)


def abs_(x) -> Column:
    return F.abs(_c(x))


def power(a, b) -> Column:
    return F.pow(_c(a), _c(b))


def max_(*xs) -> Column:
    """Variadic scalar max, null-ignoring (MaxOp) — F.greatest matches."""
    return F.greatest(*[_c(x) for x in xs])


def min_(*xs) -> Column:
    return F.least(*[_c(x) for x in xs])


def to_number(x) -> Column:
    """Lenient cast: garbage → missing (NumberOp)."""
    return _c(x).try_cast("double")


def to_integer(x) -> Column:
    return _c(x).try_cast("bigint")


def to_boolean(x) -> Column:
    return _c(x).try_cast("boolean")


def to_string(x) -> Column:
    return _c(x).cast("string")


def number_to_string(x) -> Column:
    """jx ``string`` of a number: whole values render without the trailing
    ``.0`` (mo_json value2json number formatting)."""
    c = _c(x)
    return (
        F.when(c == F.floor(c), c.cast("bigint").cast("string"))
        .otherwise(c.cast("string"))
    )


# --- strings (LengthOp, LeftOp, NotLeftOp, ConcatOp, FindOp, BetweenOp) ---

def length(s) -> Column:
    return F.length(_c(s))


def left(s, n) -> Column:
    """First n chars, n clamped to [0, len] (LeftOp)."""
    return _c(s).substr(F.lit(1), F.greatest(_c(n), F.lit(0)))


def right(s, n) -> Column:
    """Last n chars (RightOp)."""
    s, n = _c(s), _c(n)
    n = F.greatest(n, F.lit(0))
    return s.substr(F.greatest(F.length(s) - n + 1, F.lit(1)), n)


def not_left(s, n) -> Column:
    """Drop first n chars (NotLeftOp)."""
    s = _c(s)
    return s.substr(F.greatest(_c(n), F.lit(0)) + 1, F.length(s))


def not_right(s, n) -> Column:
    """Drop last n chars (NotRightOp)."""
    s = _c(s)
    return s.substr(F.lit(1), F.greatest(F.length(s) - F.greatest(_c(n), F.lit(0)), F.lit(0)))


def concat(sep: str, *xs) -> Column:
    """Join with separator, SKIPPING missing operands (ConcatOp).

    ``concat_ws`` has exactly jx's skip-null behavior; SQL ``||`` poisons.
    """
    return F.concat_ws(sep, *[_c(x) for x in xs])


def find(s, sub: str, start: int = 0) -> Column:
    """0-based index of substring; MISSING when absent, never -1 (FindOp)."""
    loc = F.locate(sub, _c(s), start + 1)
    return F.when(loc == 0, F.lit(None)).otherwise(loc - 1)


def between(s, prefix_: str, suffix_: str) -> Column:
    """Substring strictly between the first ``prefix_`` and the next
    ``suffix_``; missing if either is absent (BetweenOp)."""
    s = _c(s)
    start = F.locate(prefix_, s)
    # F.locate's pos argument is static, so search the remainder instead.
    rest = s.substr(start + len(prefix_), F.length(s))
    end = F.locate(suffix_, rest)
    return (
        F.when((start == 0) | (end == 0), F.lit(None))
        .otherwise(rest.substr(F.lit(1), end - 1))
    )


def split(s, sep: str) -> Column:
    """Split to array (SplitOp); regex-escape the literal separator."""
    import re

    return F.split(_c(s), re.escape(sep))


def upper(s) -> Column:
    """Unicode note (found by the multibyte string fuzzer): Spark's
    upper uses Java full case mapping — upper('ß') = 'SS', matching the
    reference's Python str.upper — while ICU-based engines (DuckDB)
    emit capital sharp s 'ẞ'. We are jx-faithful; oracle comparisons
    must avoid ß (pinned out of the fuzz domain)."""
    return F.upper(_c(s))


def lower(s) -> Column:
    return F.lower(_c(s))


def trim(s) -> Column:
    return F.trim(_c(s))


def get(container, key) -> Column:
    """Dynamic member access a[b] (GetOp)."""
    return F.element_at(_c(container), key)


def tuple_(*xs) -> Column:
    return F.struct(*[_c(x) for x in xs])


_NUMERIC_TYPEOF = ("tinyint", "smallint", "int", "bigint", "float", "double")


def _typeof(x) -> Column:
    return F.call_function("typeof", _c(x))


def is_number(x) -> Column:
    """Runtime type test (IsNumberOp): true iff the VALUE is a number —
    missing → false. On Spark's typed columns the type is schema-static
    (typeof folds to a constant), so this costs a null-check; kept as an
    operator for jx-query compatibility. Variant columns use
    operators/nested.py variant_is_* (dynamic per-value types)."""
    c = _c(x)
    t = _typeof(c)
    return (t.isin(*_NUMERIC_TYPEOF) | t.startswith("decimal")) & c.isNotNull()


def is_string(x) -> Column:
    c = _c(x)
    return (_typeof(c) == "string") & c.isNotNull()


def is_boolean(x) -> Column:
    c = _c(x)
    return (_typeof(c) == "boolean") & c.isNotNull()


def union_values(*arrs) -> Column:
    """Distinct union of operand value-sets (UnionOp,
    jx_base/expressions.py): missing operands contribute nothing; output
    sorted so the value-set has one canonical rendering per row (jx sets
    are unordered — sorting makes cross-engine comparison exact)."""
    norm = [F.coalesce(_c(a), F.array()) for a in arrs]
    out = norm[0]
    for a in norm[1:]:
        out = F.array_union(out, a)
    return F.array_sort(out)


def script(sql: str) -> Column:
    """Raw-backend escape hatch (ScriptOp) — ours is a SQL expression."""
    return F.expr(sql)

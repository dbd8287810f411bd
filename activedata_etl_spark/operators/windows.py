"""jx window clause → Spark Window translation.

The reference's window machinery (``vendor/jx_base/query.py ::
_normalize_window`` + incremental accumulators in
``vendor/jx_python/windows.py``) has shape
``{name, value, aggregate, edges: [partition], sort: [order],
range: {min, max}, where}``. Mapping (SURVEY.md §2.6):

- ``edges``                 → ``Window.partitionBy``
- ``sort``                  → ``.orderBy`` (jx missing-first ⇒ nulls first)
- ``range {min,max}``       → ``.rowsBetween(min, max)`` (row offsets)
- no range, with sort       → running agg: rowsBetween(unbounded, 0)
- no range, no sort         → whole-partition agg (frame-less)
- ``{"rows": {v: off}}``    → lag/lead
- ``where``                 → agg over ``F.when(cond, value)``

Float window sums use the decimal pattern: Spark recomputes sliding
frames sequentially while DuckDB uses segment trees, so double addition
order differs between engines — decimal accumulation is order-free.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec, functions as F


def spec(partition: list | None = None, order: list | None = None) -> WindowSpec:
    w = Window.partitionBy(*(partition or []))
    if order:
        w = w.orderBy(*order)
    return w


def running(w: WindowSpec) -> WindowSpec:
    """Cumulative frame: everything up to the current row."""
    return w.rowsBetween(Window.unboundedPreceding, Window.currentRow)


def sliding(w: WindowSpec, lo: int, hi: int) -> WindowSpec:
    """jx ``range {min, max}`` — row-offset frame."""
    return w.rowsBetween(lo, hi)


def dsum_over(col, w: WindowSpec, prec: int = 18, scale: int = 6) -> Column:
    """Order-independent windowed sum of a double column (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec},{scale})")).over(w).cast("double")


def exact_percentile_over(col, w_frame: WindowSpec, p: float,
                          max_frame_rows: int | None = 10_000) -> Column:
    """Exact linear-interpolated percentile over a window frame.

    Spark has no builtin exact percentile-over-window (SURVEY.md §4.3 #3);
    the reference's incremental Percentile accumulator
    (vendor/jx_python/windows.py) sorts the frame. Same here: collect the
    frame into an array, sort, interpolate at rank h=(n-1)·p.

    **Frame-size bound**: the frame MATERIALIZES as a per-row array, so
    memory is O(frame) per row and compute O(frame·log frame) — fine for
    jx's bounded row-offset frames, quadratic death for an unbounded
    frame over a big partition (an unbounded running percentile over a
    10⁸-row partition would build 10⁸ arrays of up to 10⁸ elements).
    ``max_frame_rows`` guards that misuse AT EXECUTION TIME: any frame
    exceeding it fails the job with a clear message instead of melting
    an executor. Pass ``None`` only when the caller proves the bound
    (e.g. a whole-partition frame over enumerated small groups). For
    genuinely unbounded running percentiles, use a two-pass rank-based
    plan (sorted_percentiles in functions/aggs.py) instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    arr = F.array_sort(F.collect_list(c).over(w_frame))
    n = F.size(arr)
    if max_frame_rows is not None:
        n = F.when(
            n > max_frame_rows,
            F.raise_error(F.concat(
                F.lit("exact_percentile_over: frame of "), n.cast("string"),
                F.lit(f" rows exceeds max_frame_rows={max_frame_rows}; "
                      "bound the frame or use a rank-based two-pass plan"))
            ).cast("int"),
        ).otherwise(n)
    h = (n - 1) * F.lit(float(p))
    lo = F.floor(h).cast("int")
    frac = h - F.floor(h)
    lo_v = F.element_at(arr, lo + 1).cast("double")
    hi_v = F.element_at(arr, F.least(lo + 2, n)).cast("double")
    # weighted form lo·(1-f) + hi·f, matching percentile_cont/quantile_cont
    # interpolation (the algebraically-equal lo + f·(hi-lo) rounds
    # differently in IEEE and diverges in the last ulp)
    return F.when(n == 0, F.lit(None)).otherwise(
        lo_v * (1 - frac) + hi_v * frac)


def filtered(agg_fn, value, cond: Column, w: WindowSpec) -> Column:
    """jx window ``where``: rows failing the predicate contribute nothing."""
    v = F.col(value) if isinstance(value, str) else value
    return agg_fn(F.when(cond, v)).over(w)

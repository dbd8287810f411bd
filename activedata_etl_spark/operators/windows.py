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


def qhist_bounds_over(df, value, w_frame: WindowSpec,
                      ps: dict[str, tuple[int, int]]):
    """Windowed quantile BOUNDS from log-histogram registers — the
    bounded-state companion to :func:`exact_percentile_over` (VERDICT r7
    #5). The exact form collects the frame into a per-row array: O(frame)
    memory per row, guarded by ``max_frame_rows`` because a large frame
    melts an executor. THIS form carries ≤64 bucket counters per row
    regardless of frame size — 64 conditional window SUMs over the same
    frame (one Window operator) — then selects the first bucket whose
    cumulative count reaches rank ceil(p·N), exactly like
    ``functions/qhist.qhist_quantile_bounds`` but per frame instead of
    per group.

    Correctness: bucketing is monotone in the BIGINT-truncated value, so
    the register-selected bucket IS the bucket of the exact rank-th
    order statistic — the [lo, hi] factor-2 envelope provably contains
    it (lo NULL for bucket 0, which admits every v ≤ 0; see the qhist
    module contract). ``ps`` maps output prefix → (num, den) rational
    quantiles, rank arithmetic all-BIGINT like the grouped form.

    Returns ``df`` with ``n_frame`` plus ``{name}_bucket/lo/hi`` per
    entry; a frame with zero non-null values yields NULL bounds."""
    from ..functions.qhist import _bucket

    v = F.col(value) if isinstance(value, str) else value
    b = _bucket(v)
    counts = [F.sum(F.when(b == i, F.lit(1)).otherwise(F.lit(0)))
              .over(w_frame).cast("bigint") for i in range(64)]
    out = (df.withColumn("__qn__", F.count(v).over(w_frame).cast("bigint"))
           .withColumn("__qc__", F.array(*counts)))
    zero = F.struct(F.lit(0).cast("bigint").alias("cum"),
                    F.lit(-1).cast("int").alias("b"),
                    F.lit(0).cast("int").alias("i"))
    def _fold(rank):
        # rank-selection scan over the 64 counters: first index whose
        # cumulative count reaches the target rank (pyspark HOF lambdas
        # must be strictly binary, hence the closure)
        return lambda a, c: F.struct(
            (a.cum + c).alias("cum"),
            F.when((a.b == -1) & (a.cum + c >= rank), a.i)
            .otherwise(a.b).alias("b"),
            (a.i + 1).alias("i"))

    for name, (num, den) in ps.items():
        rank = F.expr(f"CAST((__qn__ * {int(num)} + {int(den) - 1}) "
                      f"DIV {int(den)} AS BIGINT)")
        acc = F.aggregate(F.col("__qc__"), zero, _fold(rank))
        bucket = F.when(F.col("__qn__") > 0, acc.b).cast("int")
        out = out.withColumn(f"{name}_bucket", bucket)
        bc = F.col(f"{name}_bucket")
        out = (out.withColumn(
            f"{name}_lo",
            F.when(bc.isNull() | (bc <= 0), F.lit(None)).otherwise(
                F.expr(f"shiftleft(1L, {name}_bucket - 1)"))
            .cast("bigint"))
            .withColumn(
            f"{name}_hi",
            F.when(bc.isNull(), F.lit(None))
            .when(bc <= 0, F.lit(0)).otherwise(
                F.expr(f"shiftleft(1L, {name}_bucket) - 1L"))
            .cast("bigint")))
    return (out.withColumnRenamed("__qn__", "n_frame").drop("__qc__"))


def filtered(agg_fn, value, cond: Column, w: WindowSpec) -> Column:
    """jx window ``where``: rows failing the predicate contribute nothing."""
    v = F.col(value) if isinstance(value, str) else value
    return agg_fn(F.when(cond, v)).over(w)


def _mid_of_sorted(arr: Column, n: Column) -> Column:
    """Engine-portable median of a SORTED array: mean of the lower/upper
    middles, (a[(n+1)/2] + a[n/2+1]) / 2 (1-indexed). Stated this way —
    not via an engine's median() — so Spark and any oracle engine compute
    byte-identical results regardless of their interpolation defaults;
    the /2 is exact in IEEE."""
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2).cast("int") + 1)
    return (lo + hi) / 2


def rolling_median_mad(col, w_frame: WindowSpec,
                       max_frame_rows: int | None = 10_000) -> tuple[Column, Column]:
    """Rolling median and MAD (median absolute deviation) over a bounded
    window frame — the robust-statistics pair behind outlier/anomaly
    detection on noisy operational series (mean/stddev get dragged by the
    very outliers being hunted; median/MAD have 50% breakdown).

    Frame materializes as a per-row array exactly like
    :func:`exact_percentile_over` and carries the same ``max_frame_rows``
    execution-time guard. Returns ``(median, mad)`` columns."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.array_sort(F.collect_list(c).over(w_frame))
    n = F.size(arr)
    if max_frame_rows is not None:
        n = F.when(
            n > max_frame_rows,
            F.raise_error(F.concat(
                F.lit("rolling_median_mad: frame of "), n.cast("string"),
                F.lit(f" rows exceeds max_frame_rows={max_frame_rows}")))
            .cast("int"),
        ).otherwise(n)
    med = _mid_of_sorted(arr, n)
    devs = F.array_sort(F.transform(arr, lambda x: F.abs(x - med)))
    mad = _mid_of_sorted(devs, n)
    return med, mad


def ewma_int(value_6dp, w_frame: WindowSpec, micro: int = 1_000_000) -> Column:
    """Finite-horizon EWMA (α=0.5) in EXACT integer arithmetic.

    True EWMA is a sequential recurrence (y_t = α·x_t + (1−α)·y_{t−1}) —
    hostile to both parallel engines and cross-engine float parity. With
    α=0.5 and an L-row frame the closed form has integer weights
    2^(i−1): scale the 6-decimal values to integer micro-units, take the
    weighted sum and the weight total as int64, divide once as doubles.
    Every intermediate is exact (numerator < 2^53 for |x| < 4·10^9/2^L),
    so the result is bit-identical on any engine; the truncation error vs
    the infinite-horizon EWMA is ≤ 2^−L of the oldest excluded weight.

    ``w_frame`` must be an ascending-ordered rowsBetween(-(L-1), 0)
    frame; parallelism is per partition key like any window."""
    v = F.col(value_6dp) if isinstance(value_6dp, str) else value_6dp
    v6 = (v.cast("decimal(18,6)") * micro).cast("bigint")
    arr = F.collect_list(v6).over(w_frame)
    n = F.size(arr)
    weighted = F.zip_with(
        arr, F.sequence(F.lit(1), n),
        lambda x, i: x * F.pow(F.lit(2.0), i - 1).cast("bigint"))
    num = F.aggregate(weighted, F.lit(0).cast("bigint"), lambda a, x: a + x)
    den = (F.pow(F.lit(2.0), n).cast("bigint") - 1) * micro
    return num.cast("double") / den.cast("double")

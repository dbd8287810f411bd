"""Edge domains — the reference's dimension/bucketing system.

A jx ``edges`` query groups over a COMPLETE domain: the output has a cell
for every domain part, even parts no row fell into (count=0), unlike SQL
GROUP BY which only emits observed keys (reference:
``vendor/jx_base/domains.py`` for the domain types,
``vendor/jx_elasticsearch/es52/decoders.py`` for the per-type lowering —
SURVEY.md §2.5).

Spark lowering: generate the domain as a (tiny) DataFrame — literal rows
for ``set`` domains, ``sequence()``+``explode`` for ``time``/``range``
domains — and LEFT-join the grouped aggregate onto it, coalescing count
cells to 0 (sum/avg cells stay NULL, matching the reference). The domain
side is always small: Spark broadcast-joins it, so dense completion adds
no shuffle at any scale. Bounds for data-driven domains are computed
distributively (1-row agg cross-joined into the generator) — no collect
on the data path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def _complete(domain: DataFrame, agged: DataFrame, keys: list[str],
              zero_fill: Sequence[str] = (), null_safe: bool = False) -> DataFrame:
    """LEFT-join grouped results onto the dense domain; count cells → 0.

    ``null_safe=True`` joins with ``<=>`` so a NULL-keyed domain part (the
    allowNulls overflow cell) matches the NULL group — a plain equi-join
    would leave the overflow cell forever empty."""
    if null_safe:
        d, a = domain.alias("__d__"), agged.alias("__a__")
        cond = None
        for k in keys:
            c = F.col(f"__d__.{k}").eqNullSafe(F.col(f"__a__.{k}"))
            cond = c if cond is None else cond & c
        vals = [c for c in agged.columns if c not in keys]
        out = d.join(F.broadcast(a), cond, "left").select(
            *[F.col(f"__d__.{k}").alias(k) for k in keys],
            *[F.col(f"__a__.{v}").alias(v) for v in vals])
    else:
        out = domain.join(F.broadcast(agged), on=keys, how="left") if _prefer_bcast_right(agged) \
            else domain.join(agged, on=keys, how="left")
    for c in zero_fill:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out


def with_null_part(dframe: DataFrame, name: str) -> DataFrame:
    """Append the reference's allowNulls overflow part: one NULL-keyed row
    at the end of a domain frame (es52/decoders.py 'allowNulls')."""
    t = dframe.schema[name].dataType.simpleString()
    null_row = dframe.sparkSession.range(1).select(F.lit(None).cast(t).alias(name))
    return dframe.unionByName(null_row)


def _prefer_bcast_right(agged: DataFrame) -> bool:
    # Grouped aggregates over edge domains are low-cardinality by
    # construction; broadcasting avoids shuffling the domain join entirely.
    # AQE would usually get there on its own — the hint makes it a guarantee.
    return True


def set_domain(spark: SparkSession, col: str, parts: Sequence,
               dtype: str | None = None) -> DataFrame:
    """Explicit partition list ({"type":"set","partitions":[...]}).
    ``dtype=None`` infers from the partition values (a numeric jx set
    domain must keep its numeric type — a string-typed domain frame
    would string-ify the edge column of the whole dense output)."""
    if dtype is None:
        non_null = [p for p in parts if p is not None]
        if non_null and all(isinstance(p, bool) for p in non_null):
            dtype = "boolean"
        elif non_null and all(isinstance(p, int) and not isinstance(p, bool)
                              for p in non_null):
            dtype = "bigint"
        elif non_null and all(isinstance(p, (int, float)) for p in non_null):
            dtype = "double"
        else:
            dtype = "string"
    return spark.createDataFrame([(p,) for p in parts], f"{col} {dtype}")


def edges_predicate_parts(df: DataFrame, spark: SparkSession, col: str,
                          parts: list[tuple[str, Column]],
                          aggs: dict[str, Column],
                          zero_fill: Sequence[str] = (),
                          overflow: str | None = None) -> DataFrame:
    """Set domain whose partitions are PREDICATES, not values
    (jx_base/domains.py set domain with ``{name, where}`` parts): each row
    is bucketed by the FIRST matching predicate; non-matching rows go to
    the ``overflow`` part (or are dropped). Dense: every named part
    appears even when empty."""
    label = None
    for name, cond in parts:
        label = (F.when if label is None else label.when)(cond, F.lit(name))
    label = label.otherwise(F.lit(overflow))
    agged = (
        df.withColumn(col, label)
        .filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    names = [n for n, _ in parts] + ([overflow] if overflow else [])
    return _complete(set_domain(spark, col, names), agged, [col], zero_fill)


def range_domain(spark: SparkSession, col: str, lo: float, hi: float, interval: float) -> DataFrame:
    """Numeric bins [lo, hi) of width ``interval`` ({"type":"range"}).

    Generated as INTEGER steps scaled by the interval — Spark's
    ``sequence()`` is integral/temporal-only, so a fractional interval
    (jaccard bands, score deciles) would fail analysis. The value
    expression ``i·interval + lo`` is the same multiply-then-add shape
    the bucket key uses (``floor((v−lo)/interval)·interval + lo``), so
    domain values and bucket keys agree bit-for-bit in IEEE — the
    completion join cannot miss a cell to float drift."""
    import math

    n = max(0, int(math.ceil((hi - lo) / interval - 1e-9)))
    return spark.range(n).select(
        (F.col("id") * F.lit(interval) + F.lit(lo)).alias(col))


def time_domain_from_bounds(bounds: DataFrame, col: str, unit_interval: str) -> DataFrame:
    """Calendar-aware time buckets between per-data min/max bounds.

    ``bounds`` is a 1-row frame with ``lo``/``hi`` truncated timestamps;
    built by an aggregate so the whole pipeline stays distributed.
    """
    return bounds.select(
        F.explode(F.expr(f"sequence(lo, hi, interval {unit_interval})")).alias(col)
    )


def edges_set(df: DataFrame, spark: SparkSession, col: str, parts: Sequence,
              aggs: dict[str, Column], zero_fill: Sequence[str] = (),
              dtype: str = "string", allow_nulls: bool = False) -> DataFrame:
    """edges with a set domain: every listed part appears in the output.

    ``allow_nulls=True`` mirrors the reference's overflow part: rows whose
    value is missing OR outside the listed parts land in a NULL-keyed
    part appended to the domain (es52/decoders.py 'allowNulls').
    """
    if allow_nulls:
        val = F.when(F.col(col).isin(*parts), F.col(col)).otherwise(F.lit(None))
        agged = (df.withColumn(col, val)
                 .groupBy(col).agg(*[c.alias(n) for n, c in aggs.items()]))
        dom = set_domain(spark, col, parts, dtype).unionByName(
            spark.createDataFrame([(None,)], f"{col} {dtype}"))
        # null-safe join key: NULL part must match the NULL group
        joined = dom.alias("d").join(
            F.broadcast(agged.alias("a")),
            F.col(f"d.{col}").eqNullSafe(F.col(f"a.{col}")), "left"
        ).select("d.*", *[F.col(f"a.{n}") for n in aggs])
        for c in zero_fill:
            joined = joined.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
        return joined
    agged = df.groupBy(col).agg(*[c.alias(n) for n, c in aggs.items()])
    return _complete(set_domain(spark, col, parts, dtype), agged, [col], zero_fill)


def edges_range(df: DataFrame, spark: SparkSession, value: Column, col: str,
                lo: float, hi: float, interval: float,
                aggs: dict[str, Column], zero_fill: Sequence[str] = ()) -> DataFrame:
    """edges with a range domain = dense histogram: bucket by
    floor(x/interval)*interval, complete over [lo, hi)."""
    bucket = (F.floor(value / interval) * interval).cast("double").alias(col)
    agged = (
        df.filter((value >= lo) & (value < hi))
        .groupBy(bucket)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    dom = range_domain(spark, col, lo, hi, interval).select(F.col(col).cast("double").alias(col))
    return _complete(dom, agged, [col], zero_fill)


#: Duration literal units, in seconds (mo_times/durations.py vocabulary;
#: calendar units like month belong to the time domain, not duration).
DURATION_UNITS: dict[str, int] = {
    "second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}


def parse_duration_seconds(d) -> int:
    """'2 week' / 'day' / plain number → seconds (jx duration literals)."""
    if isinstance(d, (int, float)):
        return int(d)
    parts = d.strip().split()
    n, unit = (1, parts[0]) if len(parts) == 1 else (int(parts[0]), parts[1])
    return n * DURATION_UNITS[unit.rstrip("s")]


def duration_domain(spark: SparkSession, col: str, lo, hi, interval) -> DataFrame:
    """Duration bins [lo, hi) of width ``interval`` — all duration literals
    or raw seconds ({"type":"duration"}, jx_base/domains.py DurationDomain).
    Bucket values are emitted as SECONDS (bigint): durations in jx are
    seconds floats internally (mo_times), and seconds survive any engine."""
    lo_s, hi_s, iv_s = (parse_duration_seconds(x) for x in (lo, hi, interval))
    return spark.range(1).select(
        F.explode(F.sequence(F.lit(lo_s), F.lit(hi_s - iv_s), F.lit(iv_s))).alias(col)
    ).select(F.col(col).cast("bigint").alias(col))


def edges_duration(df: DataFrame, spark: SparkSession, value_seconds: Column,
                   col: str, lo, hi, interval,
                   aggs: dict[str, Column], zero_fill: Sequence[str] = ()) -> DataFrame:
    """edges with a duration domain: dense histogram of a duration-valued
    expression (seconds), bucketed to multiples of ``interval``. Same
    lowering as the range domain — arithmetic floor + broadcast domain
    completion; the domain side is tiny at any corpus scale."""
    lo_s, hi_s, iv_s = (parse_duration_seconds(x) for x in (lo, hi, interval))
    bucket = (F.floor(value_seconds / iv_s) * iv_s).cast("bigint").alias(col)
    agged = (
        df.filter((value_seconds >= lo_s) & (value_seconds < hi_s))
        .groupBy(bucket)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    return _complete(duration_domain(spark, col, lo_s, hi_s, iv_s), agged,
                     [col], zero_fill)


def edges_time_months(df: DataFrame, ts: Column, col: str,
                      aggs: dict[str, Column], zero_fill: Sequence[str] = ()) -> DataFrame:
    """edges with a calendar month time domain spanning the data's min..max,
    emitting EVERY month in range even when empty."""
    month = F.date_trunc("month", ts).alias(col)
    agged = df.groupBy(month).agg(*[c.alias(n) for n, c in aggs.items()])
    bounds = df.select(
        F.date_trunc("month", F.min(ts)).alias("lo"),
        F.date_trunc("month", F.max(ts)).alias("hi"),
    )
    dom = time_domain_from_bounds(bounds, col, "1 month")
    return _complete(dom, agged, [col], zero_fill)

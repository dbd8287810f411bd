"""Time-series regularization: resample to a fixed grid + gap fill.

The reference's time domains densify an EDGE axis (calendar parts with
zero-filled cells — ``jx_base`` time domain; operators/domains.py here);
what they never do is fill VALUES. Telemetry/sensor prep for sequence
modeling needs both: snap irregular observations to a regular grid, then
carry-forward (LOCF) or linearly interpolate the empty buckets — the
north-star §2.11 time-series shape (every sequence-model pipeline
regularizes its input the same way).

Plan shape at 100 TB:

- bucketing is a scan-local projection + one map-side-combinable
  groupBy (keys, bucket) — the only pass over the raw data;
- the grid is generated per key from its own (min, max) span —
  ``sequence()`` + ``explode``, output-proportional, never a cross
  join against a global calendar;
- fills are two windows per key ordered by bucket — ONE shuffle on
  keys shared by both (Spark reuses the partitioning+sort between
  window specs over the same (partition, order));
- values aggregate through the decimal-exact mean (functions/exact),
  so the result is reproducible across partition layouts and
  hash-matchable against any oracle engine.

A key whose span is huge relative to its observation count explodes the
grid (sequence() caps at 2^31 elements and memory long before) —
``max_buckets`` guards it: spans wider than the cap raise rather than
silently OOM-ing an executor, the same contract as domains.to_cube's
cell cap. The guard is IN-PLAN (assert_true over the per-key span rows,
evaluated at execution) — a construction-time probe would re-run the
full bucket aggregation as an extra job on every call (r9 review).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.exact import davg

MAX_BUCKETS_DEFAULT = 1_000_000


def resample(df: DataFrame, ts: str, value: str, keys: list[str],
             step_sec: int, max_buckets: int = MAX_BUCKETS_DEFAULT) -> DataFrame:
    """Snap observations to a ``step_sec`` grid per key: one row per
    (keys, bucket) over each key's dense [min, max] bucket span, with
    ``v`` = decimal-exact mean of the bucket's observations (NULL for
    empty buckets). ``t`` is the bucket's epoch-second start."""
    bucket = (F.floor(F.col(ts).cast("double") / step_sec)
              .cast("bigint") * step_sec)
    obs = (df.groupBy(*keys, bucket.alias("t"))
           .agg(davg(value).alias("__v_obs__")))
    span = obs.groupBy(*keys).agg(
        F.min("t").alias("__t0__"), F.max("t").alias("__t1__"))
    # span-cap assert embedded in the sequence step: assert_true is
    # NULL on success, so the step passes through; an oversize key
    # fails the job with the message instead of OOMing an executor.
    # In-plan means zero extra jobs at construction and plan-only
    # explain stays execution-free for free.
    ok = ((F.col("__t1__") - F.col("__t0__")) / step_sec) < max_buckets
    msg = (f"resample: a key's span exceeds max_buckets={max_buckets} "
           f"at step={step_sec}s; widen the step or raise the cap")
    step = F.when(F.assert_true(ok, F.lit(msg)).isNull(),
                  F.lit(step_sec).cast("bigint"))
    grid = span.select(
        *keys, F.explode(F.sequence("__t0__", "__t1__", step)).alias("t"))
    return (grid.join(obs, [*keys, "t"], "left")
            .withColumnRenamed("__v_obs__", "v"))


def fill_locf(keys: list[str], t: str = "t", v: str = "v") -> Column:
    """Last-observation-carried-forward over the dense grid: the most
    recent non-null value at or before each bucket (NULL before the
    first observation — which resample() never emits, since each key's
    grid starts at its first observed bucket)."""
    w = (Window.partitionBy(*keys).orderBy(t)
         .rowsBetween(Window.unboundedPreceding, 0))
    return F.last(F.col(v), ignorenulls=True).over(w)


def fill_linear(keys: list[str], t: str = "t", v: str = "v") -> Column:
    """Linear interpolation between the surrounding observations:
    ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)``, exactly
    that expression in IEEE double so any oracle engine can reproduce it
    bit-for-bit. Observed buckets keep their value; interior gaps always
    have both neighbors because each key's grid spans its own
    observations."""
    obs_t = F.when(F.col(v).isNotNull(), F.col(t))
    wp = (Window.partitionBy(*keys).orderBy(t)
          .rowsBetween(Window.unboundedPreceding, 0))
    wn = (Window.partitionBy(*keys).orderBy(t)
          .rowsBetween(0, Window.unboundedFollowing))
    pv = F.last(F.col(v), ignorenulls=True).over(wp)
    pt = F.last(obs_t, ignorenulls=True).over(wp)
    nv = F.first(F.col(v), ignorenulls=True).over(wn)
    nt = F.first(obs_t, ignorenulls=True).over(wn)
    return F.when(F.col(v).isNotNull(), F.col(v)).otherwise(
        pv + (nv - pv) * (F.col(t) - pt) / (nt - pt))

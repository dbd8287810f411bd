"""Dashboard-analytics [Q] pairs: funnel, retention cohorts, sketch
audits — the interactive-service shapes the reference's CI-dashboard
users run (sequences of dependent stage filters, cohort lattices, and
approximate aggregates checked against exact truth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table
from .registry import query


@query(
    "events_funnel_steps",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t1
      FROM events e JOIN s USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s.t0
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t1
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM c) AS n_click_after,
           (SELECT COUNT(*) FROM p) AS n_purchase_after
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who signed up, then clicked strictly AFTER
    their first signup, then purchased strictly after that first click.
    Each stage is a groupBy-min over the prior stage's survivors —
    three hash aggregations and two equi-joins, no window over the full
    event stream, so the plan scales with distinct users per stage
    (the steepest funnel stage bounds the shuffles)."""
    e = load_table(spark, sf_dir, "events")

    def first_after(etype: str, prev: DataFrame, prev_t: str, out_t: str) -> DataFrame:
        return (e.filter(F.col("event_type") == etype)
                .join(prev, "user_id")
                .filter(F.col("ts") > F.col(prev_t))
                .groupBy("user_id").agg(F.min("ts").alias(out_t)))

    s = (e.filter(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("t0")))
    c = first_after("click", s, "t0", "t1")
    p = first_after("purchase", c, "t1", "t2")
    return (s.agg(F.count(F.lit(1)).alias("n_signup"))
            .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after")))
            .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after"))))


@query(
    "events_retention_cohorts",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    )
    SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST((epoch(a.week) - epoch(f.cohort_week)) / 604800 AS BIGINT)
             AS week_offset,
           COUNT(*) AS n_users
    FROM first f JOIN act a USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users grouped by first-seen week, counted in
    every later week they were active. Both engines truncate weeks to
    Monday and difference epoch seconds (week-truncated stamps are exact
    multiples of 604800s apart in UTC — no calendar arithmetic needed).
    Two hash shuffles (first-seen, distinct activity) + one equi-join on
    user_id; cohort output is weeks², tiny at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    first = (e.groupBy("user_id")
             .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week")))
    act = (e.select("user_id", F.date_trunc("week", "ts").alias("week"))
           .distinct())
    return (first.join(act, "user_id")
            .select("cohort_week",
                    ((F.unix_timestamp("week")
                      - F.unix_timestamp("cohort_week")) / 604800)
                    .cast("bigint").alias("week_offset"))
            .groupBy("cohort_week", "week_offset")
            .agg(F.count(F.lit(1)).alias("n_users")))


@query(
    "agg_sketch_audit",
    oracle="""
    SELECT l_returnflag,
           true AS median_within_bound,
           true AS ndv_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit (the dedup_minhash_estimate pattern): the
    approximate aggregates a 100 TB deployment actually runs —
    approx_percentile (Greenwald-Khanna) and approx_count_distinct
    (HyperLogLog++) — checked inside the query against the exact answers
    at audit scale. The oracle states the PASS condition; a sketch
    regression (accuracy param, Spark upgrade) flips a cell to false and
    fails the hash gate. Both sketches are deterministic given the data,
    so the audit is reproducible."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_med"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("apx_med"),
        F.countDistinct("l_orderkey").alias("exact_ndv"),
        F.expr("approx_count_distinct(l_orderkey, 0.02)").alias("apx_ndv"),
    )
    # GK with accuracy=10000 on ~100k rows: rank error ≤ N/10000 → value
    # error bounded by the local density; 1% of the exact median is a
    # generous pass band for this distribution. HLL rsd=0.02 → 5% band.
    return g.select(
        "l_returnflag",
        (F.abs(F.col("apx_med") - F.col("exact_med"))
         <= 0.01 * F.abs(F.col("exact_med"))).alias("median_within_bound"),
        (F.abs(F.col("apx_ndv") - F.col("exact_ndv"))
         <= 0.05 * F.col("exact_ndv")).alias("ndv_within_5pct"),
    )


@query(
    "window_range_trailing_7d",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS trail7_sum,
           COUNT(*) OVER w AS trail7_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-range window frame (jx's row-offset frames are covered
    elsewhere; this is the time-valued `RANGE BETWEEN` kind): per-user
    trailing-7-day sum and count. Both engines order by exact INTEGER
    microseconds (unix_micros / epoch_us) — the fixture's timestamps
    carry sub-second micros, and a double-epoch ordering could disagree
    at a frame boundary within rounding error, so the frame bound is
    integer arithmetic end-to-end. Decimal-sum pattern keeps the float
    total order-independent. One window exchange on user_id."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy(F.unix_micros("ts"))
         .rangeBetween(-604_800_000_000, 0))
    return e.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w)
         .cast("double").alias("trail7_sum"),
        F.count(F.lit(1)).over(w).alias("trail7_n"),
    )


@query(
    "agg_corr_covar",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (sxy - sx * sy / n) / (n - 1) AS covar_qty_price,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
    FROM m
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-variable moments — the 2-var extension of the mergeable
    zero-moment stats aggregate: sample covariance and Pearson
    correlation from decimal-exact sums (Σx, Σy, Σxy, Σx², Σy²). The
    builtins (covar_samp/corr) accumulate doubles in partition order and
    diverge across layouts AND engines; moment sums in decimal are
    order-free, and the closing arithmetic is the byte-identical
    expression on both sides. The cross terms cast each FACTOR to
    decimal and multiply in decimal — casting the double PRODUCT rounds
    at the target scale, where Spark (HALF_UP on the exact binary
    expansion) and DuckDB disagree in the last ulp (measured). Widths
    differ per engine for exactness: Spark (18,6)×(18,6)→(37,12) stays
    under its 38-precision cap (no rescale), DuckDB needs (19,6) casts
    to force int128 multiplication (its 18-digit decimals multiply in
    int64 and overflow); the decimal VALUES are identical either way.
    The wide sums convert decimal→double THROUGH AN EXACT STRING: a
    scale-12 int128 decimal exceeds 2^53, and DuckDB's direct
    decimal→double double-rounds (int→double, then /10^scale) while
    Spark's BigDecimal route rounds once — via string both engines do
    one correctly-rounded strtod (measured last-ulp divergence
    otherwise). The moments are also what a distributed
    merge needs — partial states add, exactly like the stats op."""
    from ..functions.exact import dsum

    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sx"),
        dsum("l_extendedprice").alias("sy"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")
              * F.col("l_extendedprice").cast("decimal(18,6)"))
         .cast("string").cast("double").alias("sxy"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")
              * F.col("l_quantity").cast("decimal(18,6)"))
         .cast("string").cast("double").alias("sxx"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")
              * F.col("l_extendedprice").cast("decimal(18,6)"))
         .cast("string").cast("double").alias("syy"),
    )
    return m.select(
        "l_returnflag",
        ((F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
         / (F.col("n") - 1)).alias("covar_qty_price"),
        ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
         / (F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))))
        .alias("corr_qty_price"),
    )


@query(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_quantity, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_quantity ASC) AS rn
      FROM lineitem GROUP BY l_returnflag, l_quantity
    )
    SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_n
    FROM c WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value; ties → smallest value —
    builtin mode() is tie-arbitrary in both engines, so both sides state
    the argmax explicitly): count per (group, value), then one
    row_number pick. Two shuffles, both on low-cardinality keys; the
    per-group value histogram is the same intermediate count_values
    builds."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity").asc())
    return (c.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("l_returnflag", F.col("l_quantity").alias("mode_qty"),
                    F.col("n").alias("mode_n")))


@query(
    "events_resample_ffill",
    oracle="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM b
    ), hv AS (
      SELECT user_id, date_trunc('hour', ts) AS h, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT g.user_id, CAST(g.h AS TIMESTAMP) AS h,
           last_value(l.value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.h
             ROWS UNBOUNDED PRECEDING) AS v_ffill
    FROM grid g
    LEFT JOIN (SELECT user_id, h, value FROM hv WHERE rn = 1) l
      ON g.user_id = l.user_id AND g.h = l.h
    """,
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with forward fill — the time-series
    gap-filling op (hypertable-rollup shape): per user, an hourly grid
    from first to last event, carrying each hour's LAST observed value
    (explicit tiebreak) forward across empty hours. Grid = sequence()
    per key exploded scan-local (rows ≈ keys × hours, no shuffle to
    build); fill = one last-ignorenulls window per key. The fill value
    is carried, never arithmetic, so floats stay hash-exact."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    b = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"))
    grid = b.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"))
    hw = Window.partitionBy("user_id", F.date_trunc("hour", "ts")).orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    lastv = (e.withColumn("rn", F.row_number().over(hw))
             .filter(F.col("rn") == 1)
             .select("user_id", F.date_trunc("hour", "ts").alias("h"), "value"))
    fw = (Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(lastv, ["user_id", "h"], "left")
            .select("user_id", "h",
                    F.last("value", ignorenulls=True).over(fw).alias("v_ffill")))


@query(
    "events_hourly_ohlc",
    oracle="""
    WITH hv AS (
      SELECT user_id, date_trunc('hour', ts) AS h, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts ASC, event_id ASC) AS rf,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM events
    )
    SELECT user_id, h,
           MIN(CASE WHEN rf = 1 THEN value END) AS open_v,
           MIN(CASE WHEN rl = 1 THEN value END) AS close_v,
           MIN(value) AS lo, MAX(value) AS hi, COUNT(*) AS n
    FROM hv GROUP BY user_id, h
    """,
)
def events_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly downsample with open/close/low/high — the rollup companion
    to the gap-filling resample. Open/close are ARGMIN/ARGMAX over the
    unique (ts, event_id) order, expressed as one struct-min/max inside
    a single hash aggregation (no window pass, no second shuffle): the
    lexicographic struct comparison picks the earliest/latest event and
    carries its value. The oracle states the same picks via row_number,
    proving the struct trick against an independent formulation."""
    e = load_table(spark, sf_dir, "events")
    h = F.date_trunc("hour", "ts")
    return (e.groupBy("user_id", h.alias("h")).agg(
        F.min(F.struct("ts", "event_id", "value")).getField("value").alias("open_v"),
        F.max(F.struct("ts", "event_id", "value")).getField("value").alias("close_v"),
        F.min("value").alias("lo"), F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n")))


@query(
    "events_value_zscore",
    oracle="""
    WITH m AS (
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sxx
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           (e.value - m.sx / m.n)
             / sqrt((m.sxx - m.sx * m.sx / m.n) / (m.n - 1)) AS z
    FROM events e JOIN m USING (user_id)
    """,
)
def events_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key standardization (anomaly scoring): z = (x − mean)/sd with
    the mean and sample sd from decimal-exact moments (same wide-sum
    string-route as agg_corr_covar), then one broadcast-join of the tiny
    per-key moment table back onto the stream — the classic two-pass
    standardize, one shuffle for moments, map-side for the scoring
    pass. The closing arithmetic is the byte-identical expression on
    both engines, so even the float z-scores hash exactly."""
    from ..functions.exact import dsum

    e = load_table(spark, sf_dir, "events")
    m = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("sx"),
        F.sum(F.col("value").cast("decimal(18,6)")
              * F.col("value").cast("decimal(18,6)"))
         .cast("string").cast("double").alias("sxx"))
    return (e.join(F.broadcast(m), "user_id")
            .select("event_id", "user_id",
                    ((F.col("value") - F.col("sx") / F.col("n"))
                     / F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                              / (F.col("n") - 1))).alias("z")))


@query(
    "events_resample_interp",
    oracle="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM b
    ), hv AS (
      SELECT user_id, date_trunc('hour', ts) AS h, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ), j AS (
      SELECT g.user_id, g.h, l.value AS v
      FROM grid g
      LEFT JOIN (SELECT user_id, h, value FROM hv WHERE rn = 1) l
        ON g.user_id = l.user_id AND g.h = l.h
    ), flanked AS (
      SELECT user_id, h, v,
        last_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY h ROWS UNBOUNDED PRECEDING) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY h ROWS UNBOUNDED PRECEDING) AS ph,
        first_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      FROM j
    )
    SELECT user_id, CAST(h AS TIMESTAMP) AS h,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                  pv + (nv - pv) * ((epoch(h) - epoch(ph)) / (epoch(nh) - epoch(ph)))
           END AS v_interp
    FROM flanked
    """,
)
def events_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill — the other resample mode: missing
    grid hours between two observations take pv + (nv−pv)·frac with
    frac from exact integer epoch seconds of hour-truncated stamps
    (identical division both engines), edges (before first / after last
    observation) stay NULL. Two windows per key (carry-back and
    carry-forward) over the same grid join as the ffill op; the
    interpolation expression is byte-identical on both sides so the
    float results hash exactly."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    b = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"))
    grid = b.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"))
    hw = Window.partitionBy("user_id", F.date_trunc("hour", "ts")).orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    lastv = (e.withColumn("rn", F.row_number().over(hw))
             .filter(F.col("rn") == 1)
             .select("user_id", F.date_trunc("hour", "ts").alias("h"),
                     F.col("value").alias("v")))
    j = grid.join(lastv, ["user_id", "h"], "left")
    wp = (Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = (Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    flanked = j.select(
        "user_id", "h", "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("ph"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(wn).alias("nh"))
    frac = ((F.unix_timestamp("h") - F.unix_timestamp("ph"))
            / (F.unix_timestamp("nh") - F.unix_timestamp("ph")))
    return flanked.select(
        "user_id", "h",
        F.when(F.col("v").isNotNull(), F.col("v"))
         .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(),
               F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
         .alias("v_interp"))


@query(
    "events_rolling_mad_anomaly",
    # median stated as mean-of-middles over the sorted frame list — the
    # engine-portable form (operators/windows._mid_of_sorted), NOT an
    # engine median() whose interpolation policy may differ.
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, value,
             list_sort(list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) AS a
      FROM events
    ), m AS (
      SELECT event_id, user_id, value, a, len(a) AS n,
             (a[CAST(floor((len(a) + 1) / 2) AS INT)]
              + a[CAST(floor(len(a) / 2) AS INT) + 1]) / 2 AS med
      FROM w
    ), d AS (
      SELECT event_id, user_id, value, med,
             list_sort(list_transform(a, x -> abs(x - med))) AS dv, n
      FROM m
    ), s AS (
      SELECT event_id, user_id, value, med,
             (dv[CAST(floor((n + 1) / 2) AS INT)]
              + dv[CAST(floor(n / 2) AS INT) + 1]) / 2 AS mad
      FROM d
    )
    SELECT event_id, user_id, value, med AS roll_med, mad AS roll_mad,
           CASE WHEN mad > 0 THEN abs(value - med) > 3 * mad
                ELSE abs(value - med) > 0 END AS is_anomaly
    FROM s
    """,
)
def events_rolling_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust rolling anomaly detection: trailing-20-event median + MAD
    per user, flag points deviating > 3 MAD (mean/stddev would be dragged
    by the outliers themselves; median/MAD have 50% breakdown). One
    window exchange per user; the frame is bounded (20 rows) so the
    per-row array materialization is O(20) regardless of corpus size."""
    from ..operators import windows as W
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-19, 0))
    med, mad = W.rolling_median_mad("value", w)
    return (e.select("event_id", "user_id", "value",
                     med.alias("roll_med"), mad.alias("roll_mad"))
            .withColumn("is_anomaly",
                        F.when(F.col("roll_mad") > 0,
                               F.abs(F.col("value") - F.col("roll_med"))
                               > 3 * F.col("roll_mad"))
                        .otherwise(F.abs(F.col("value") - F.col("roll_med")) > 0)))


@query(
    "events_ewma",
    # exact-integer closed form: 6-decimal values → micro-units, weights
    # 2^(i-1) over a 20-row frame, one double division at the end. Every
    # intermediate is an exact int64 (< 2^53), so both engines produce
    # bit-identical doubles with no float-sum ordering hazard.
    oracle="""
    WITH w AS (
      SELECT event_id, user_id,
             list(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS a
      FROM events
    )
    SELECT event_id, user_id,
           CAST(CAST(list_sum(list_transform(range(1, len(a) + 1),
                  i -> a[i] * CAST(power(2, i - 1) AS BIGINT))) AS BIGINT) AS DOUBLE)
           / CAST((CAST(power(2, len(a)) AS BIGINT) - 1) * 1000000 AS DOUBLE)
             AS ewma
    FROM w
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average (α=0.5, 20-lag
    horizon) — the classic smoothing recurrence made parallel-safe via
    its closed form in exact integer arithmetic (operators/windows.
    ewma_int). Truncating at 20 lags bounds the error at 2^-20 of the
    excluded tail while turning a sequential scan into an ordinary
    bounded window."""
    from ..operators import windows as W
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-19, 0))
    return e.select("event_id", "user_id", W.ewma_int("value", w).alias("ewma"))

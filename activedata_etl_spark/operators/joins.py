"""Join helpers: the menu the reference implies but never names.

The jx language has NO join operator — ActiveData denormalizes at ETL time
(dict-lookup enrichment in ``activedata_etl/transforms/*``, TUID/changeset
annotation in ``imports/tuid_client.py`` / ``mo_hg``; SURVEY.md §2.3). On
Spark those ETL-time joins become first-class relational joins; this module
adds the two non-trivial shapes (range containment, as-of) as DataFrame
compositions plus scale guidance baked into each helper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def broadcast_equi(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Fact ⨝ small dimension: force broadcast so the 100 TB side never
    shuffles (the reference's in-memory dict lookup, distributed)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def range_join(fact: DataFrame, dim: DataFrame, value: Column,
               lo: Column, hi: Column, how: str = "inner") -> DataFrame:
    """Containment join: dim rows are [lo, hi) intervals. With a small dim
    this is a broadcast nested-loop join — fine; with a large dim consider
    bucketing both sides by floor(value/width) first."""
    return fact.join(F.broadcast(dim), (value >= lo) & (value < hi), how=how)


def asof_join(left: DataFrame, right: DataFrame, left_on: str, right_on: str,
              left_time: str, right_time: str,
              tiebreak: str, right_cols: list[str] | None = None,
              tolerance_s: float | None = None,
              direction: str = "backward",
              split_hot_keys: int | None = None) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` per key (LEFT semantics: unmatched left
    rows survive with NULLs). The reference's TUID "latest annotation ≤
    revision" lookup (SURVEY.md §2.3).

    ``direction="forward"`` mirrors it: the EARLIEST right row with
    ``right_time >= left_time`` (the "next deploy after this failure"
    lookup). Ties on time resolve to the largest tiebreak backward and
    the smallest forward — the natural mirror. Same single-shuffle plan:
    only the scan order of the carry-forward window flips.

    ``tolerance_s`` bounds staleness: a right row older than
    ``left_time − tolerance_s`` seconds does not match (NULLs instead) —
    the "quote must be fresh" variant every market-data as-of has. Plain
    column arithmetic on the carried match time; plan shape unchanged.

    Implementation: union both sides sorted by (key, time, side, tiebreak)
    and carry the last right payload forward with ``last(..., ignorenulls)``
    over a running frame — ONE shuffle on the key and no candidate
    multiplication, vs. the naive inequality-join + row_number pick whose
    intermediate is |left| × (matching right rows per key). ``tiebreak``
    must make the right-side ordering total, otherwise the result is
    nondeterministic under parallelism. At 100 TB the only hazard is a hot
    key (one celebrity user owning a partition's worth of rows):
    ``split_hot_keys=N`` pre-splits every key into N equal time ranges,
    as-ofs within each (key, range) — so the biggest window partition
    shrinks N× — and stitches range boundaries by carrying each range's
    FINAL right payload into later ranges through a (key, range)-sized
    side table (n_keys·N rows, never data-sized). The rewrite is
    result-invisible: a left row whose match lives in an earlier range
    sees it via the carried boundary payload, and within-range matches
    shadow it exactly as the unsplit scan would. Costs one extra
    min/max pass + one small self-window + one equi-join; use it when a
    key's row count exceeds what one task should sort (SCALE.md rig).
    """
    right_cols = right_cols or [c for c in right.columns if c not in left.columns]
    lt, rt = dict(left.dtypes)[left_time], dict(right.dtypes)[right_time]
    common = lt if lt == rt else (
        "timestamp" if {lt, rt} & {"date", "timestamp", "timestamp_ntz"} else "double"
    )
    # Rows that can never match (SQL: NULL key/time compares false) are
    # dropped right-side / pass through unmatched left-side.
    side_r = right.filter(F.col(right_on).isNotNull() & F.col(right_time).isNotNull()).select(
        F.col(right_on).alias("__k__"),
        F.col(right_time).cast(common).alias("__t__"),
        F.lit(0).alias("__side__"),
        F.col(tiebreak).alias("__tb__"),
        F.struct(F.col(right_time).cast(common).alias("__rt__"),
                 *[F.col(c) for c in right_cols]).alias("__payload__"),
    )
    side_l = left.select(
        F.col(left_on).alias("__k__"),
        F.col(left_time).cast(common).alias("__t__"),
        F.lit(1).alias("__side__"),
        *left.columns,
    )
    unioned = side_r.unionByName(side_l, allowMissingColumns=True)
    if direction == "backward":
        order = [F.col("__t__").asc(), F.col("__side__").asc(),
                 F.col("__tb__").asc()]
    elif direction == "forward":
        # descending time scan: the payload last carried before a left row
        # is the SMALLEST right time still >= it; __tb__ desc makes the
        # smallest tiebreak win at equal times
        order = [F.col("__t__").desc(), F.col("__side__").asc(),
                 F.col("__tb__").desc()]
    else:
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    part_cols = ["__k__"]
    if split_hot_keys and split_hot_keys > 1:
        n = int(split_hot_keys)
        lohi = unioned.agg(F.min(F.col("__t__").cast("double")),
                           F.max(F.col("__t__").cast("double"))).first()
        lo, hi = lohi[0], lohi[1]
        if lo is not None and hi is not None and hi > lo:
            width = (hi - lo) / n
            unioned = unioned.withColumn(
                "__split__",
                F.least(F.lit(n - 1),
                        F.floor((F.col("__t__").cast("double") - lo)
                                / width)).cast("int"))
            part_cols = ["__k__", "__split__"]
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__best__", F.last("__payload__", ignorenulls=True).over(w))
    if len(part_cols) == 2:
        # Boundary stitch: each (key, range)'s FINAL right payload — the
        # scan-order-last right row, i.e. max_by (min_by forward) over
        # (t, tiebreak), a cheap partial-aggregated groupBy over the
        # RIGHT rows only, no second window over the data — is carried
        # into LATER ranges (earlier in a forward scan) over the
        # (key, range) universe and fills left rows whose within-range
        # carry is empty. The universe comes from a distinct over both
        # sides so ranges holding only left rows still receive a carry.
        # coalesce is exact: a non-null within-range carry is always
        # scan-later than anything carried across the boundary. The
        # stitch join keys equal the window partition keys, so the big
        # side reuses its exchange; the incoming side is n_keys·N rows.
        pick = F.max_by if direction == "backward" else F.min_by
        finals_r = (unioned.filter(F.col("__side__") == 0)
                    .groupBy("__k__", "__split__")
                    .agg(pick("__payload__", F.struct("__t__", "__tb__"))
                         .alias("__fin__")))
        universe = unioned.select("__k__", "__split__").distinct()
        finals = universe.join(finals_r, ["__k__", "__split__"], "left")
        split_order = (F.col("__split__").asc() if direction == "backward"
                       else F.col("__split__").desc())
        carry = (Window.partitionBy("__k__").orderBy(split_order)
                 .rowsBetween(Window.unboundedPreceding, -1))
        incoming = (finals
                    .withColumn("__in__",
                                F.last("__fin__", ignorenulls=True)
                                .over(carry))
                    .select("__k__", "__split__", "__in__"))
        matched = (matched.join(incoming, ["__k__", "__split__"], "left")
                   .withColumn("__best__",
                               F.coalesce("__best__", "__in__")))
    matched = matched.filter(F.col("__side__") == 1)
    if tolerance_s is not None:
        fresh = (
            F.col("__best__.__rt__").cast("double")
            >= F.col("__t__").cast("double") - F.lit(float(tolerance_s))
        ) if direction == "backward" else (
            F.col("__best__.__rt__").cast("double")
            <= F.col("__t__").cast("double") + F.lit(float(tolerance_s)))
        matched = matched.withColumn(
            "__best__", F.when(fresh, F.col("__best__")))
    return matched.select(
        *left.columns,
        *[F.col(f"__best__.{c}").alias(c) for c in right_cols],
    )


def asof_join_nearest(left: DataFrame, right: DataFrame,
                      left_on: str, right_on: str,
                      left_time: str, right_time: str,
                      tiebreak: str,
                      right_cols: list[str] | None = None) -> DataFrame:
    """NEAREST as-of: for each left row, the right row minimizing the
    absolute time distance in EITHER direction — the missing member of
    the backward/forward/tolerance family (the "closest sensor reading"
    lookup; pandas merge_asof(direction='nearest')).

    Tie rules, total and documented: equal distance on opposite sides →
    the BACKWARD row wins (≤ beats ≥, matching the family's backward
    default); equal times within the backward side → largest
    ``tiebreak``; within the forward side → smallest (each direction's
    native rule).

    Plan: the asof_join union, ONE shuffle on the key, then TWO carry
    windows over the SAME partitioning (ascending scan for the backward
    winner, descending for the forward winner — Catalyst reuses the
    exchange, paying only the second sort), and a per-row pick by
    distance. No candidate multiplication, no second shuffle. Hot keys:
    apply the same pre-split rationale as asof_join(split_hot_keys=N)
    upstream if a key outgrows one task's sort.
    """
    right_cols = right_cols or [c for c in right.columns
                                if c not in left.columns]
    lt, rt = dict(left.dtypes)[left_time], dict(right.dtypes)[right_time]
    common = lt if lt == rt else (
        "timestamp" if {lt, rt} & {"date", "timestamp", "timestamp_ntz"}
        else "double")
    side_r = (right.filter(F.col(right_on).isNotNull()
                           & F.col(right_time).isNotNull())
              .select(F.col(right_on).alias("__k__"),
                      F.col(right_time).cast(common).alias("__t__"),
                      F.lit(0).alias("__side__"),
                      F.col(tiebreak).alias("__tb__"),
                      F.struct(F.col(right_time).cast(common).alias("__rt__"),
                               *[F.col(c) for c in right_cols])
                      .alias("__payload__")))
    side_l = left.select(F.col(left_on).alias("__k__"),
                         F.col(left_time).cast(common).alias("__t__"),
                         F.lit(1).alias("__side__"),
                         *left.columns)
    unioned = side_r.unionByName(side_l, allowMissingColumns=True)
    frame = (Window.partitionBy("__k__")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wb = frame.orderBy(F.col("__t__").asc(), F.col("__side__").asc(),
                       F.col("__tb__").asc())
    wf = frame.orderBy(F.col("__t__").desc(), F.col("__side__").asc(),
                       F.col("__tb__").desc())
    carried = (unioned
               .withColumn("__bwd__",
                           F.last("__payload__", ignorenulls=True).over(wb))
               .withColumn("__fwd__",
                           F.last("__payload__", ignorenulls=True).over(wf))
               .filter(F.col("__side__") == 1))
    bd = (F.col("__t__").cast("double")
          - F.col("__bwd__.__rt__").cast("double"))
    fd = (F.col("__fwd__.__rt__").cast("double")
          - F.col("__t__").cast("double"))
    use_b = F.col("__bwd__").isNotNull() \
        & (F.col("__fwd__").isNull() | (bd <= fd))
    chosen = F.when(use_b, F.col("__bwd__")).otherwise(F.col("__fwd__"))
    out = carried.withColumn("__chosen__", chosen)
    return out.select(
        *left.columns,
        *[F.col(f"__chosen__.{c}").alias(c) for c in right_cols],
    )


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          l_start: str, l_end: str,
                          r_start: str, r_end: str,
                          bin_width_s: int = 3600,
                          extra_cond: Column | None = None) -> DataFrame:
    """Interval-overlap join ([l_start,l_end] ∩ [r_start,r_end] ≠ ∅) via
    TIME BINNING: each interval explodes to the fixed-width bins it
    covers, candidates equi-join on the bin id, and the exact overlap
    predicate verifies. A pair sharing k bins would match k times; the
    FIRST-SHARED-BIN guard (emit only where the bin equals
    floor(max(starts)/width) — the first bin both intervals occupy)
    keeps exactly one match per pair, replacing the r1 design's final
    ``.distinct()`` — one whole shuffle+aggregate over the matched pairs
    removed from the plan (plan-asserted), and join multiplicity now
    follows SQL semantics (duplicate input rows each produce their own
    matches; the old distinct silently collapsed them).

    The naive formulation (inequality-only join) has no equi-key, so
    Spark plans a broadcast nested loop — O(|L|·|R|) comparisons, dead at
    scale. Binning makes it an ordinary shuffle join on an integer key
    that AQE can size and skew-split. ``bin_width_s`` trades fan-out
    (long intervals explode into many bins) against bucket density
    (short bins → fewer false candidates); pick ~the median interval
    length. Degenerate long intervals (a session spanning days) fan out
    proportionally — cap or split those upstream (sessionize_capped).
    """
    def binned(df: DataFrame, s: str, e: str, side: str) -> DataFrame:
        b = F.explode(F.sequence(
            F.floor(F.col(s).cast("double") / bin_width_s).cast("long"),
            F.floor(F.col(e).cast("double") / bin_width_s).cast("long"),
        )).alias("__bin__")
        return df.select(F.struct(*df.columns).alias(side), b)

    lb, rb = binned(left, l_start, l_end, "l"), binned(right, r_start, r_end, "r")
    first_shared = F.floor(
        F.greatest(F.col(f"l.{l_start}"), F.col(f"r.{r_start}"))
        .cast("double") / bin_width_s).cast("long")
    cond = (F.col("__bin__") == F.col("__rbin__")) \
        & (F.col("__bin__") == first_shared) \
        & (F.col(f"l.{l_start}") <= F.col(f"r.{r_end}")) \
        & (F.col(f"r.{r_start}") <= F.col(f"l.{l_end}"))
    if extra_cond is not None:
        cond = cond & extra_cond
    return (lb.join(rb.withColumnRenamed("__bin__", "__rbin__"), cond)
            .drop("__bin__", "__rbin__"))


def bloom_prefilter(probe: DataFrame, build: DataFrame, probe_key, build_key,
                    n_bits: int = 1 << 16, n_hashes: int = 3) -> DataFrame:
    """Bloom semi-join reduction: cut the probe side BEFORE its shuffle.

    When the build side is too big to broadcast raw but small after its
    filters, a big-big join shuffles the full probe side only to discard
    most of it. A Bloom filter of the build keys IS broadcastable
    (n_bits/8 bytes regardless of key count), has no false negatives, and
    drops non-matching probe rows at the scan — the classic semi-join
    reduction Spark's own runtime bloom injection performs, exposed here
    as an explicit operator (hash-count/size tunable, works under any
    join the optimizer picks downstream).

    Construction is pure Column arithmetic: k=``n_hashes`` xxhash64 seeds
    → bit positions → per-word bit_or aggregate → ONE row holding a
    word→bits map, cross-broadcast onto the probe. Result-invisible by
    Bloom's one-sided error: follow with the exact join; false positives
    (rate ≈ (1-e^{-kn/m})^k) cost shuffle bytes, never correctness.
    """
    # xxhash64 is TYPE-sensitive: the same logical key hashed as int vs
    # bigint (or decimal vs double) lands on different bits, which would
    # silently break the no-false-negative guarantee — every true match
    # dropped at the prefilter. Canonicalize both sides to string before
    # hashing so only logical value equality matters. (Caveat: types whose
    # string forms differ at equal value — decimal "5.00" vs double "5.0" —
    # must be pre-cast to a common type by the caller, same as for the
    # exact join itself.)
    pk = (F.col(probe_key) if isinstance(probe_key, str) else probe_key).cast("string")
    bk = (F.col(build_key) if isinstance(build_key, str) else build_key).cast("string")

    def positions(key) -> list[Column]:
        return [F.pmod(F.xxhash64(key, F.lit(s)), F.lit(n_bits))
                for s in range(n_hashes)]

    bloom = (
        build.select(F.explode(F.array(*positions(bk))).alias("bp"))
        .select((F.col("bp") / 64).cast("int").alias("w"),
                F.expr("shiftleft(1L, CAST(bp % 64 AS INT))").alias("m"))
        .groupBy("w").agg(F.expr("bit_or(m)").alias("m"))
        .groupBy().agg(F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("w", "m")))).alias("__bloom__"))
    )
    out = probe.crossJoin(F.broadcast(bloom))
    cond = None
    for s in range(n_hashes):
        bp = f"__bp{s}__"
        out = out.withColumn(bp, F.pmod(F.xxhash64(pk, F.lit(s)), F.lit(n_bits)))
        word = F.coalesce(
            F.element_at(F.col("__bloom__"), (F.col(bp) / 64).cast("int")),
            F.lit(0))
        # shiftleft's pyspark wrapper takes only literal shift amounts;
        # the SQL form accepts a column
        mask = F.expr(f"shiftleft(1L, CAST({bp} % 64 AS INT))")
        test = word.bitwiseAND(mask) != 0
        cond = test if cond is None else (cond & test)
    return (out.filter(cond)
            .drop("__bloom__", *[f"__bp{s}__" for s in range(n_hashes)]))

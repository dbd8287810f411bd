"""Time-window operators over event streams — batch-checkable forms.

The reference's streaming is micro-batch-by-SQS-queue with date-rollover
indexes (SURVEY.md §2.10); real Structured Streaming templates live in
``streaming/stream.py``. The operators here are the window semantics
themselves — tumbling/sliding/session/dedup — written on plain DataFrames
so the identical code path serves both batch jobs and ``readStream``
inputs (Spark's unified API: these transformations are streaming-valid).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def tumbling(df: DataFrame, ts: str, width: str, keys: list[str],
             aggs: dict[str, Column]) -> DataFrame:
    """Non-overlapping windows: every event in exactly one bucket."""
    return (
        df.groupBy(F.window(ts, width).alias("w"), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(F.col("w.start").alias("wstart"), F.col("w.end").alias("wend"),
                *keys, *aggs.keys())
    )


def sliding(df: DataFrame, ts: str, width: str, slide: str, keys: list[str],
            aggs: dict[str, Column]) -> DataFrame:
    """Overlapping windows (width > slide ⇒ each event in width/slide
    buckets); epoch-aligned starts, same as F.window's contract."""
    return (
        df.groupBy(F.window(ts, width, slide).alias("w"), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(F.col("w.start").alias("wstart"), F.col("w.end").alias("wend"),
                *keys, *aggs.keys())
    )


def sessionize(df: DataFrame, ts: str, gap: str, keys: list[str],
               aggs: dict[str, Column]) -> DataFrame:
    """Gap-based sessions: events within ``gap`` of each other merge.

    Uses ``F.session_window`` — streaming-native (works under watermark);
    window end = last event + gap. The equivalent batch-SQL formulation
    (lag + cumulative sum of new-session flags) is what the DuckDB oracle
    runs, so both derivations are cross-checked.

    Batch inputs are pre-hashed by key before the aggregate: session
    merging is sort-heavy, and map-side partial aggregation ties it to
    however few tasks the scan produced (one, for a single-row-group
    file) while rarely merging much — input splits interleave users. The
    explicit repartition keeps exactly one shuffle and lands the merge on
    every reduce task (~30% at sf0.1). Streaming frames are left alone:
    the stateful operator owns its partitioning.
    """
    if keys and not df.isStreaming:
        df = df.repartition(*[F.col(k) for k in keys])
    return (
        df.groupBy(F.session_window(ts, gap).alias("w"), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), *keys, *aggs.keys())
    )


def sessionize_salted(df: DataFrame, ts: str, gap: str, keys: list[str],
                      chunk_s: int = 86400) -> DataFrame:
    """Gap-based sessions with TIME-CHUNK salting for hot keys — the
    window analog of :mod:`operators.skew`'s salted join (guide §2.5:
    AQE skew handling applies to joins only; a single hot key's events
    otherwise land in ONE sessionize task however large).

    Two passes, exact:

    1. sessionize within (keys, time-chunk) — ``chunk_s``-second chunks
       partition the timeline, so a hot key's events spread over
       #chunks tasks instead of one. Within a chunk the session pieces
       are exactly the global sessions clipped to the chunk.
    2. merge adjacent per-chunk session PIECES on session rows (events ∕
       sessions-fold fewer rows than pass 1's input): a piece starting
       within ``gap`` of the previous piece's last event continues the
       same session — the identical ≤/> boundary rule the one-pass form
       uses (pinned by tests/test_session_boundary.py), so the merged
       sessions equal ``sessionize``'s for ANY chunk width.

    Residual skew: pass 2's per-key window sees one row per session
    piece. For real corpora sessions ≪ events; a key whose every event
    is its own session degenerates to the output's own size — no
    algorithm can spread a per-key ordered merge below that.

    Returns (session_start, session_end, *keys, n_events) — the
    ``sessionize`` output shape for a count aggregate. NOT used by the
    registered queries: fixture corpora have no hot keys and the
    one-pass form wins at bench scale (see OPTIMIZATION_r14.md); this
    exists for the 100 TB posture and is equality-tested + skew-rigged
    against the one-pass form.
    """
    chunk = (F.col(ts).cast("double") / F.lit(chunk_s)).cast("long")
    pieces = (
        df.withColumn("__chunk__", chunk)
        .groupBy(F.session_window(ts, gap).alias("w"), "__chunk__", *keys)
        .agg(F.count(F.lit(1)).alias("__n__"),
             F.min(ts).alias("__s__"), F.max(ts).alias("__e__")))
    wo = Window.partitionBy(*keys).orderBy("__s__")
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_e = F.lag("__e__").over(wo)
    new_s = (prev_e.isNull()
             | (F.col("__s__") > prev_e + F.expr(f"INTERVAL {gap}"))
             ).cast("int")
    merged = (pieces
              .withColumn("__new__", new_s)
              .withColumn("__grp__", F.sum("__new__").over(run)))
    return (merged.groupBy(*keys, "__grp__")
            .agg(F.min("__s__").alias("session_start"),
                 (F.max("__e__") + F.expr(f"INTERVAL {gap}"))
                 .alias("session_end"),
                 F.sum("__n__").alias("n_events"))
            .select("session_start", "session_end", *keys, "n_events"))


def dedup_latest(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keep the latest row per key under an explicit TOTAL order — the
    batch form of the reference's idempotent `_id`-overwrite dedup
    (push_to_es) and of streaming dropDuplicatesWithinWatermark."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order])
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def sessionize_capped(df: DataFrame, ts: str, gap: str, keys: list[str],
                      tiebreak: str, max_events: int,
                      aggs: dict[str, Column]) -> DataFrame:
    """Gap-based sessions SPLIT at ``max_events`` events — the bot-guard
    variant (a scraper hammering one key can otherwise grow a session,
    and its window state, without bound). Not expressible with
    F.session_window, so this uses the lag+cumsum formulation directly:
    new-session flags → running session number → row number within
    session → segment = (rn-1) / cap. One shuffle on the keys; every
    window shares that partitioning.

    ``tiebreak`` must make the per-key event order total, or segment
    boundaries are nondeterministic under parallelism.
    """
    from pyspark.sql import Window, functions as F

    order = [F.col(ts), F.col(tiebreak)]
    wo = Window.partitionBy(*keys).orderBy(*order)
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(ts).over(wo)
    new_s = (prev.isNull()
             | (F.col(ts) > prev + F.expr(f"INTERVAL {gap}"))).cast("int")
    # every derived column rides the SAME (keys, order) running window —
    # one exchange total before the aggregate. The naive alternative
    # (row_number over (keys, session)) re-shuffles on the session id;
    # instead: position within session = running row count − the running
    # count captured at the session's first row (carried with max-over
    # of a flagged value). Measured ~2× on the sf0.1 bench entry.
    d = (df.withColumn("__new__", new_s)
           .withColumn("__sess__", F.sum("__new__").over(run))
           .withColumn("__rn__", F.count(F.lit(1)).over(run)))
    sess_first_rn = F.max(
        F.when(F.col("__new__") == 1, F.col("__rn__"))).over(run)
    d = d.withColumn(
        "__seg__", F.floor((F.col("__rn__") - sess_first_rn) / max_events))
    return (d.groupBy(*keys, "__sess__", "__seg__")
            .agg(F.min(ts).alias("session_start"), *[
                c.alias(n) for n, c in aggs.items()])
            .withColumnRenamed("__sess__", "session_no")
            .withColumnRenamed("__seg__", "segment"))

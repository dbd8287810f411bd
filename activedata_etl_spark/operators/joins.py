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
              left_id: str | None = None) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` per key (LEFT semantics: unmatched left
    rows survive with NULLs). The reference's TUID "latest annotation ≤
    revision" lookup (SURVEY.md §2.3).

    Implementation: inequality join → per-left-row ``row_number`` pick.
    ``tiebreak`` must make the right-side ordering total, otherwise the
    result is nondeterministic under parallelism. At scale prefer
    pre-bucketing both sides on the key; the window partitions by left row
    id so state stays bounded.
    """
    right_cols = right_cols or [c for c in right.columns if c not in left.columns]
    if left_id is None:
        lid = "__asof_left_id__"
        tagged = left.withColumn(lid, F.monotonically_increasing_id())
    else:
        lid, tagged = left_id, left
    cand = tagged.join(
        right,
        (tagged[left_on] == right[right_on]) & (right[right_time] <= tagged[left_time]),
        "inner",
    )
    w = Window.partitionBy(lid).orderBy(F.col(right_time).desc(), F.col(tiebreak).desc())
    best = (
        cand.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select(lid, *right_cols)
    )
    out = tagged.join(best, on=lid, how="left")
    return out if left_id else out.drop(lid)

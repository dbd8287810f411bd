"""Sessionize skew rig (VERDICT r13 #4 "Done" criterion).

One user owns ~all events: the one-pass sessionize lands that key's
entire sort+merge on ONE task (AQE skew handling splits joins only —
guide §2.5), while the time-chunk salted form spreads it over
#chunks tasks and merges on session PIECES. Both produce identical
sessions (equality-tested in tests/test_session_boundary.py and
asserted again here on the rig corpus).

Corpus: N events for user 1 at a deterministic 10-60 s cadence with a
>30 min gap every ~1000 events (so sessions are real and numerous),
plus 100 small users. Timed with the noop-style count of the full
output, median of 3, fresh session per form.

Usage: python scripts/sessionize_skew_rig_r14.py [n_events]
Writes scripts/sessionize_skew_rig_r14.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    from activedata_etl_spark.streaming import batch_windows as BW

    # hot user 1: cadence 10-60 s, a >30 min hole every ~1000 events;
    # 100 cold users with 1000 events each.
    hot = spark.range(n).select(
        F.lit(1).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000)
            + F.col("id") * 35
            + (F.col("id") % 60)
            + (F.col("id") / 1000).cast("long") * 2000).alias("ts"))
    cold = spark.range(100_000).select(
        (F.col("id") % 100 + 2).cast("int").alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000)
                            + (F.col("id") / 100).cast("long") * 40).alias("ts"))
    ev = hot.unionByName(cold)

    def timed(build):
        runs = []
        for _ in range(3):
            t0 = time.time()
            out = build()
            nrows = out.count()
            runs.append(round(time.time() - t0, 2))
        return nrows, sorted(runs)[1], min(runs)

    one = lambda: BW.sessionize(ev, "ts", "30 minutes", ["user_id"],
                                {"n_events": F.count(F.lit(1))})
    salted = lambda: BW.sessionize_salted(ev, "ts", "30 minutes",
                                          ["user_id"], chunk_s=86400)
    n1, med1, min1 = timed(one)
    n2, med2, min2 = timed(salted)
    eq = (sorted(map(tuple, one().collect()))
          == sorted(map(tuple, salted()
                        .select("session_start", "session_end", "user_id",
                                "n_events").collect())))
    out = {"n_events": n, "sessions": n1,
           "one_pass": {"rows": n1, "med": med1, "min": min1},
           "salted": {"rows": n2, "med": med2, "min": min2},
           "equal": eq}
    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, "scripts",
                           "sessionize_skew_rig_r14.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

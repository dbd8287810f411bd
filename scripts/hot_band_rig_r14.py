"""Adversarial hot-band rig (VERDICT r13 #1 "Done" criterion).

Constructs the corpus the bounded fan-out exists for: N vectors whose
first 16 dims are all-positive, so ALL of them share one band-0 sign
signature — one band bucket holding the whole corpus (the correlated-
dimension / all-positive-region failure mode of sign-LSH on real
embedding corpora). Bands 1-3 vary per vector, so the rest of the
bucket universe stays normal.

Two measurements, each in a FRESH subprocess with a deliberately tight
heap (local mode: executor == driver JVM, so spark.driver.memory caps
executor memory too):

- mode=unbounded: fanout_limit high enough that the hot bucket takes
  the collect_list + O(m²) pair-array path (the pre-r14 shape).
  Expected: OOM / executor death on the fan-out.
- mode=bounded (default FANOUT_BUCKET_LIMIT=256): the hot bucket routes
  to the sort-merge self-join leg — bounded aggregation state,
  spillable join buffers, pair stream never materialized as one array.
  Expected: completes; wall recorded at two corpus sizes to show the
  wall tracks the pair count (m²) with no memory blowup.

threshold > 1 keeps the OUTPUT empty (cos ≤ 1 always) while every
candidate pair is still generated and verified — the rig measures the
fan-out machinery, not result transfer.

Usage:
  python scripts/hot_band_rig_r14.py run <mode> <n_hot> <heap>   # one case
  python scripts/hot_band_rig_r14.py                             # full rig
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_case(mode: str, n_hot: int, heap: str) -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.driver.memory", heap)
             .config("spark.sql.shuffle.partitions", "32")
             .getOrCreate())
    from activedata_etl_spark.ext import similarity as SIM

    # deterministic corpus: dims 0-15 strictly positive (shared band-0
    # sig); dims 16-63 take sign from the bits of the row id, spreading
    # bands 1-3 across many small buckets.
    base = spark.range(1, n_hot + 1).select(
        F.col("id").alias("vec_id"),
        F.array(*(
            [F.lit(0.5) + ((F.col("id") % (j + 2)).cast("double") + 1.0)
             / (j + 3.0) for j in range(16)]
            + [F.when(F.xxhash64(F.col("id"), F.lit(j)) > 0, F.lit(1.0))
               .otherwise(F.lit(-1.0)) for j in range(48)]
        )).alias("embedding"))
    limit = None if mode == "bounded" else 1 << 30
    t0 = time.time()
    out = SIM.cosine_dedup_pairs(base, "vec_id", "embedding",
                                 threshold=1.5, fanout_limit=limit)
    n = out.count()
    wall = round(time.time() - t0, 2)
    print(json.dumps({"mode": mode, "n_hot": n_hot, "heap": heap,
                      "rows": n, "wall_sec": wall}), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "run":
        run_case(sys.argv[2], int(sys.argv[3]), sys.argv[4])
        return
    cases = [
        ("bounded", 4000, "3g"),
        ("bounded", 8000, "3g"),
        ("unbounded", 8000, "3g"),
    ]
    results = []
    for mode, n, heap in cases:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run", mode,
             str(n), heap],
            capture_output=True, text=True, timeout=3600)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")]
        if p.returncode == 0 and line:
            results.append(json.loads(line[-1]))
        else:
            err = p.stderr or ""
            sig = ("java.lang.OutOfMemoryError: Java heap space"
                   if "Java heap space" in err
                   else "OutOfMemoryError" if "OutOfMemoryError" in err
                   else "killed/failed")
            results.append({"mode": mode, "n_hot": n, "heap": heap,
                            "outcome": sig, "rc": p.returncode})
        print(json.dumps(results[-1]), flush=True)
    with open(os.path.join(REPO, "scripts", "hot_band_rig_r14.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

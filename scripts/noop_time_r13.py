"""Isolate per-query compute time with the noop sink (guide §1.4).

Usage: python scripts/noop_time_r13.py q1,q2,... [n_runs]

For each named query: build the DataFrame once, one discarded warm-up
noop write, then n_runs (default 5) timed noop writes; prints median and
min. This times the full computation of every column of every row with
no driver transfer, so it is the measurement to trust when deciding
whether a plan change helped — the bench's collect/count numbers remain
the driver-visible contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from activedata_etl_spark.queries import QUERIES
    from activedata_etl_spark.session import get_spark

    names = sys.argv[1].split(",")
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("noop_time_r13")

    out = {}
    for name in names:
        df = QUERIES[name](spark, SF_DIR)

        def run() -> float:
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        spark.sparkContext.setJobDescription(f"noop:{name}")
        run()  # warm-up, discarded
        runs = sorted(run() for _ in range(n_runs))
        out[name] = {"median": round(runs[len(runs) // 2], 3),
                     "min": round(runs[0], 3)}
        print(f"{name}: median {out[name]['median']}s "
              f"min {out[name]['min']}s", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

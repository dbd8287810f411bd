"""Registry-wide differential sweep at sf0.1 (VERDICT r12 #5 — the per-round cadence).

The driver's gate runs at sf0.01; the bug class that only shows at
larger data (decimal ties, overflow, bucket-boundary rounding — the r4
centroid-tie bug was caught by exactly this sweep) needs a recorded
full-registry pass at sf0.1. Runs every oracle-paired query through
parity.run_all on a fresh vanilla session against DuckDB over the same
parquet, and writes a PARITY_SF01-style artifact.

Usage: python scripts/parity_sf01_r13.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .getOrCreate())
    from activedata_etl_spark.parity import run_all

    t0 = time.time()
    res = run_all(spark, "/root/testdata/sf0.1")
    wall = round(time.time() - t0, 1)
    bad = [r for r in res if not r.ok]
    out = {
        "sf": 0.1,
        "total": len(res),
        "passed": len(res) - len(bad),
        "wall_sec": wall,
        "failures": {r.name: r.mismatches[:4] for r in bad},
    }
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_sf01.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"sweep": f"{out['passed']}/{out['total']}",
                      "wall_sec": wall, "out": dest}), flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

"""Full-registry differential sweep at an arbitrary SF (r14 close).

Fresh vanilla local[8] process, every oracle-paired query vs DuckDB
over the same parquet. Usage:
  python scripts/sweep_registry_r14.py <sf_dir> <out_json>
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

    sf_dir = sys.argv[1]
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .getOrCreate())
    from activedata_etl_spark.parity import run_all

    t0 = time.time()
    res = run_all(spark, sf_dir)
    wall = round(time.time() - t0, 1)
    bad = [r for r in res if not r.ok]
    out = {"sf_dir": sf_dir, "total": len(res),
           "passed": len(res) - len(bad), "wall_sec": wall,
           "failures": {r.name: r.mismatches[:4] for r in bad}}
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sweep_r14.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"sweep": f"{out['passed']}/{out['total']}",
                      "wall_sec": wall, "out": dest}), flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

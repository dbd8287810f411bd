"""Capture .explain("formatted") for headline queries → plans/r14/.

Usage: python scripts/capture_plans_r14.py [suffix] [q1,q2,...]

suffix defaults to "before"; query list defaults to every bench HEADLINE
entry (non-headline registered names are accepted too). Writes
plans/r14/<query>_<suffix>.txt. Plans are deterministic (AQE initial
plan), so this can run under load; only index builds cost anything and
they reuse the same persisted scratch dirs as the bench.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import HEADLINE
    from activedata_etl_spark.queries import QUERIES
    from activedata_etl_spark.session import get_spark

    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(HEADLINE)
    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture_plans_r14")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} bytes", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()

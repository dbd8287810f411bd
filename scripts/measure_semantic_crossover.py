"""Settle the semantic-dedup ``nlist="auto"`` question (VERDICT r10 #5):
the √N claim needs a measurement ABOVE the N≈20k constant-bound regime
where the 10× rig left it (auto = 2.7× fixed-16 there). This harness
rotates-and-replicates the rig's embeddings to ~200k vectors (the
make_scale_rig transform: cyclic component shift per replica preserves
norms and within-replica cosines, decorrelates cross-replica) and times
CLUSTERING ALONE — ivf_build fixed-16 vs the auto path (√N centroids
through the two-level √nlist quantizer) — at each corpus size.

The claim under test: fixed-k clustering is O(N·16·dim) with small
constants, auto is O(N·√N·dim / pruning) with bigger constants; if √N
is ever to pay on clustering, the curve must bend before the within-
cluster refinement blowup (the knob's real justification, r8) is the
only defense left.

Usage: python scripts/measure_semantic_crossover.py [out_json]
(Idle machine only.)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_bench/sf1")
RIG = "/tmp/spark_graft_bench/emb_xover"
MULTIPLIERS = [1, 4, 10]  # × the sf1 rig's ~20k vectors → up to ~200k
OFFSET = 100_000_000


def _replicate(spark, k: int, dst: str) -> None:
    from pyspark.sql import functions as F

    base = spark.read.parquet(os.path.join(SRC, "embeddings.parquet")) \
        .select("vec_id", "embedding")
    reps = []
    for i in range(k):
        r = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFFSET))
        if i > 0:
            sz = F.size("embedding")
            s = i % 64
            col = F.concat(F.slice("embedding", F.lit(s + 1), sz - F.lit(s)),
                           F.slice("embedding", F.lit(1), F.lit(s)))
            if i >= 64:
                col = F.transform(col, lambda x: -x)
            r = r.withColumn("embedding", col)
        reps.append(r)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(dst)


def _median(fn, n=3):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return round(runs[len(runs) // 2], 3)


def main() -> None:
    from activedata_etl_spark.ext import similarity as SIM
    from activedata_etl_spark.session import get_spark

    spark = get_spark("sem_xover")
    out = {}
    for k in MULTIPLIERS:
        dst = os.path.join(RIG, f"x{k}")
        if not os.path.isdir(dst):
            _replicate(spark, k, dst)
        emb = spark.read.parquet(dst)
        n = emb.count()
        nlist_auto = max(2, int(math.isqrt(n)))

        def cluster(nlist, two_level):
            cent, assign = SIM.ivf_build(emb, "vec_id", "embedding",
                                         nlist=nlist, n_iter=2,
                                         two_level=two_level)
            assign.count()

        rec = {
            "n_vectors": n,
            "nlist_auto": nlist_auto,
            "fixed16_sec": _median(lambda: cluster(16, False)),
            "auto_sqrtN_sec": _median(
                lambda: cluster(nlist_auto, True)),
        }
        rec["auto_over_fixed"] = round(
            rec["auto_sqrtN_sec"] / rec["fixed16_sec"], 2)
        out[f"x{k}"] = rec
        print(json.dumps({f"x{k}": rec}), flush=True)

    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sem_xover.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"done": True, "out": dest}))


if __name__ == "__main__":
    main()

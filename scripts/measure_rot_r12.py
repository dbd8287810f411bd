"""Rotation overhead at rig scale (r12 full-OPQ adoption): the
adjudication proved the recall win; this prices the COST side —

- encode throughput with rotation=None vs a fixed matrix vs the
  composed rotation+permutation, 1x (sf0.1) and 10x (sf1 rig): the
  rotation is a plan-time literal projection, so throughput should be
  CPU-bound-flat, not shuffle-shaped;
- pca_rotation training wall (the two exact aggregates + eigensolve)
  full vs train_fraction=0.1 at both scales — the N·dim² explode is
  the one corpus-growing cost and the md5 sample must bound it.

Usage: python scripts/measure_rot_r12.py [out_json]
(Idle machine only.)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALES = {
    "1x": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    "10x": os.environ.get("SPARK_GRAFT_SF1_DIR",
                          "/tmp/spark_graft_bench/sf1"),
}
M, KSUB, DIM = 4, 8, 64


def _median(fn, n=3):
    runs = []
    for _ in range(n):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    runs.sort()
    return round(runs[len(runs) // 2], 2)


def main() -> None:
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import pq as PQ
    from activedata_etl_spark.queries.q_ext10 import _fixed_rotation
    from activedata_etl_spark.session import get_spark

    spark = get_spark("rot_r12")
    rot = _fixed_rotation()
    out = {}
    for label, d in SCALES.items():
        emb = (spark.read.parquet(os.path.join(d, "embeddings.parquet"))
               .select("vec_id", "embedding").persist())
        n = emb.count()
        cb = PQ.pq_train(emb, "vec_id", "embedding", m=M, ksub=KSUB,
                         n_iter=2, dim=DIM, train_fraction=0.1).persist()
        cb.count()
        perm = PQ.dim_permutation(emb, "vec_id", "embedding", M, DIM,
                                  rot=rot)

        def enc(r=None, p=None):
            PQ.pq_encode(emb, "vec_id", "embedding", cb, m=M, dim=DIM,
                         perm=p, rot=r).write.mode("overwrite") \
                .format("noop").save()

        row = {
            "n_vectors": n,
            "encode_plain_s": _median(lambda: enc()),
            "encode_rotated_s": _median(lambda: enc(r=rot)),
            "encode_rot_perm_s": _median(lambda: enc(r=rot, p=perm)),
            "pca_train_full_s": _median(
                lambda: PQ.pca_rotation(emb, "vec_id", "embedding", DIM)),
            "pca_train_10pct_s": _median(
                lambda: PQ.pca_rotation(emb, "vec_id", "embedding", DIM,
                                        train_fraction=0.1)),
        }
        out[label] = row
        print(json.dumps({label: row}), flush=True)
        emb.unpersist()
        cb.unpersist()
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rot_r12.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"done": True, "out": dest}))


if __name__ == "__main__":
    main()

"""Deterministic scale-rig generator: replicate an sf dataset K× with
key offsets so bench.py can run the HEADLINE set at 10× scale (VERDICT
r7 #3 — constants hide at sf0.1; a super-linear shape shows up in the
sf1/sf0.1 ratio before it matters at 100 TB).

Replication preserves each operator's scaling-relevant structure:

- star-schema FKs stay consistent: every key column gets the same
  ``replica * 10_000_000`` offset on both sides (region/nation — the
  genuinely global dims — are copied as-is).
- documents: replica texts are WORD-SALTED (``r{i}x`` prefix per
  token), a bijective remap of the shingle space per replica — each
  replica reproduces sf0.1's internal similarity structure exactly,
  while cross-replica Jaccard is 0. Near-dup pair counts therefore
  scale LINEARLY (×K), the way a real 10× corpus behaves; naive
  replication would create K identical copies of every text and
  quadratic (K²) pair blowup, benchmarking a pathology instead of
  scale (the SCALE.md adversarial rigs cover that case separately).
- embeddings: replica vectors are component-rotated (cyclic shift by
  replica index) — norms and within-replica cosines are preserved,
  cross-replica vectors decorrelate, so ANN/cosine-dedup candidate
  volume also scales linearly.
- events: users get offset ids over the same time range — per-user
  session structure is exactly sf0.1's, K× more of it.

Output is Spark-read-only bench data (directory-per-table parquet; the
DuckDB oracle never reads it — correctness is gated at sf0.01).

Usage: python scripts/make_scale_rig.py [K] [src_sf_dir] [dst_dir]
Defaults: 10 /root/testdata/sf0.1 /tmp/spark_graft_bench/sf1
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OFFSET = 10_000_000

KEYS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}


def main(k: int, src: str, dst: str) -> None:
    from pyspark.sql import functions as F

    from activedata_etl_spark.io import load_table
    from activedata_etl_spark.session import get_spark

    spark = get_spark("scale-rig")
    os.makedirs(dst, exist_ok=True)
    for t in ("region", "nation"):
        load_table(spark, src, t).write.mode("overwrite") \
            .parquet(os.path.join(dst, f"{t}.parquet"))
        print(f"  {t}: copied", file=sys.stderr)
    for t, keys in KEYS.items():
        base = load_table(spark, src, t)
        reps = []
        for i in range(k):
            r = base
            for kc in keys:
                dt = base.schema[kc].dataType.simpleString()
                r = r.withColumn(kc, (F.col(kc) + F.lit(i * OFFSET)).cast(dt))
            if t == "documents" and i > 0:
                salt = f"r{i}x"
                r = (r.withColumn(
                        "text",
                        F.array_join(
                            F.transform(F.split(F.col("text"), " "),
                                        lambda w: F.concat(F.lit(salt), w)),
                            " "))
                     .withColumn("n_chars",
                                 F.length("text").cast("bigint")))
            if t == "embeddings" and i > 0:
                # cyclic shift WITHIN the vector dimension (dim=64 here,
                # so no two replicas i<dim share a rotation — an earlier
                # `i % 8` made replicas 8/9 exact copies of 0/1,
                # re-creating the quadratic-duplicate pathology this rig
                # exists to avoid); past dim, flip signs as a second
                # orthogonal transform (norms/within-replica cosines
                # still preserved)
                sz = F.size("embedding")
                s = i % 64
                col = F.concat(
                    F.slice("embedding", F.lit(s + 1), sz - F.lit(s)),
                    F.slice("embedding", F.lit(1), F.lit(s)))
                if i >= 64:
                    col = F.transform(col, lambda x: -x)
                r = r.withColumn("embedding", col)
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.repartition(32).write.mode("overwrite") \
            .parquet(os.path.join(dst, f"{t}.parquet"))
        print(f"  {t}: x{k}", file=sys.stderr)
    print(f"scale rig ready: {dst}", file=sys.stderr)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(int(args[0]) if args else 10,
         args[1] if len(args) > 1 else "/root/testdata/sf0.1",
         args[2] if len(args) > 2 else "/tmp/spark_graft_bench/sf1")

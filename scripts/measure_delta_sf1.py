"""Scale-evidence runner for the persisted-index DELTA families and the
corpus-adaptive ``*_auto`` forms (VERDICT r8 #5/#6).

For each index family, times the index-served delta query against its
full-rerun twin at 1× (sf0.1) and 10× (the sf1 rig) — the claim under
test is delta-FLAT vs rerun-LINEAR. For the auto forms, times the
fixed-knob twin and the adaptive form at both scales — the claim is
that ``n_bits="auto"`` / ``nlist="auto"`` turn the fixed-parameter
densification blowups (~59× / ~30×) into ≲12× growth.

Protocol: per (query, scale) one untimed run (index build + warm-up —
the BUILD cost is reported separately as the first-run wall), then
median of 3 timed runs. Prints one JSON line per measurement and a
final summary line; SCALE.md records the table.

Usage: python scripts/measure_delta_sf1.py [out_json]
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
    "10x": os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_bench/sf1"),
}

# family -> (delta / index-served query, full-rerun twin)
DELTA_FAMILIES = {
    "prefix_stable": ("dedup_prefix_stable_order_delta",
                      "dedup_prefix_filter_pairs"),
    "bm25": ("text_bm25_delta_topk", "text_bm25_topk"),
    "chunk": ("dedup_chunk_delta_stats", "dedup_chunk_level"),
    "ahash": ("multimodal_ahash_index_pairs", "multimodal_ahash_pairs"),
    "minhash": ("dedup_index_delta_pairs", "dedup_lsh_jaccard_pairs"),
}

AUTO_PAIRS = {
    "ann_multiprobe": ("sim_ann_multiprobe_bulk", "sim_ann_multiprobe_bulk_auto"),
    "semantic_dedup": ("dedup_semantic_clusters", "dedup_semantic_clusters_auto"),
}


def time_query(spark, fn, sf_dir: str, n_runs: int = 3):
    """First run builds any persisted index (reported separately as the
    one-time cost); each timed run RECONSTRUCTS the DataFrame — the
    index-served families materialize via localCheckpoint at
    construction, so re-counting a built frame would time cache reads,
    not the steady-state query. A fresh construction with the index
    already on disk IS the steady-state delta path."""
    t0 = time.perf_counter()
    n = fn(spark, sf_dir).count()  # index build (if cold) + warm-up
    build = time.perf_counter() - t0
    runs = []
    for _ in range(n_runs):
        spark.catalog.clearCache()  # a prior run's persists must not serve
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        runs.append(time.perf_counter() - t0)
    runs.sort()
    return {"first_run": round(build, 3),
            "median": round(runs[len(runs) // 2], 3),
            "min": round(runs[0], 3), "rows": n}


def main() -> None:
    from activedata_etl_spark.queries import QUERIES
    from activedata_etl_spark.session import get_spark

    spark = get_spark("delta_sf1")
    out: dict = {"delta": {}, "auto": {}}
    for fam, (delta_q, full_q) in DELTA_FAMILIES.items():
        out["delta"][fam] = {}
        for scale, sf_dir in SCALES.items():
            rec = {
                "delta": time_query(spark, QUERIES[delta_q], sf_dir),
                "full": time_query(spark, QUERIES[full_q], sf_dir),
            }
            out["delta"][fam][scale] = rec
            print(json.dumps({"family": fam, "scale": scale, **rec}),
                  flush=True)
    for fam, (fixed_q, auto_q) in AUTO_PAIRS.items():
        out["auto"][fam] = {}
        for scale, sf_dir in SCALES.items():
            rec = {
                "fixed": time_query(spark, QUERIES[fixed_q], sf_dir),
                "auto": time_query(spark, QUERIES[auto_q], sf_dir),
            }
            out["auto"][fam][scale] = rec
            print(json.dumps({"family": fam, "scale": scale, **rec}),
                  flush=True)
    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/delta_sf1.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"done": True, "out": dest}))


if __name__ == "__main__":
    main()

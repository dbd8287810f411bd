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
    # r12: same bulk fixture, positional (sets-sidecar) verify — the
    # acceptance test for VERDICT r11 #1 is this row ≤0.8× its full twin
    "prefix_stable_positional": ("dedup_prefix_stable_positional",
                                 "dedup_prefix_filter_pairs"),
    "bm25": ("text_bm25_delta_topk", "text_bm25_topk"),
    "chunk": ("dedup_chunk_delta_stats", "dedup_chunk_level"),
    "ahash": ("multimodal_ahash_index_pairs", "multimodal_ahash_pairs"),
    "ahash_group": ("multimodal_ahash_group_pairs", "multimodal_ahash_pairs"),
    "minhash": ("dedup_index_delta_pairs", "dedup_lsh_jaccard_pairs"),
}

AUTO_PAIRS = {
    "ann_multiprobe": ("sim_ann_multiprobe_bulk", "sim_ann_multiprobe_bulk_auto"),
    "semantic_dedup": ("dedup_semantic_clusters", "dedup_semantic_clusters_auto"),
}


def _minhash_1pct_delta(spark, sf_dir):
    """REALISTIC nightly shape (r10): 1% delta against a 99% v2-layout
    index — the registered fixture keeps its 50% delta because the
    oracle needs cross-pairs, so the seek-shaped claim is priced here
    instead (the r9 prefix_stable precedent)."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import dedup_index as DI
    from activedata_etl_spark.io import load_table
    from activedata_etl_spark.queries.registry import ensure_built, scratch_dir

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.pmod("doc_id", F.lit(100)) != 1)
    delta = d.filter(F.pmod("doc_id", F.lit(100)) == 1)
    path = scratch_dir(sf_dir, "dedup_delta_1pct_v2")
    ensure_built(path,
                 lambda: DI.build_index(corpus, "doc_id", "text", path))
    return DI.pairs_against_index(delta, "doc_id", "text", spark, path,
                                  threshold=0.2)


def _prefix_1pct_positional(spark, sf_dir):
    """The registered 1% stable-delta fixture with verify='positional'
    instead of its counts default — priced against the registered
    counts form (the 'full' slot below) to check the r12 verify does
    NOT regress the realistic nightly shape (VERDICT r11 #1's second
    acceptance criterion)."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import dedup as DD
    from activedata_etl_spark.io import load_table
    from activedata_etl_spark.queries.q_ext9 import _PLANT_ID, _stable_index

    d = load_table(spark, sf_dir, "documents")
    path, order_path = _stable_index(spark, sf_dir, d)
    has_sh = F.size(DD.shingles(DD.tokens(F.col("text")), 3)) > 0
    anchor = (d.filter((F.pmod("doc_id", F.lit(4)) == 0) & has_sh)
              .orderBy("doc_id").limit(1)
              .select(F.lit(_PLANT_ID).cast("long").alias("doc_id"),
                      "text"))
    delta = (d.filter(F.pmod("doc_id", F.lit(100)) == 1)
             .select("doc_id", "text").unionByName(anchor))
    return DD.prefix_join_stable_delta(spark, path, order_path, delta,
                                       "doc_id", "text", threshold=0.5,
                                       verify="positional")


def _prefix_1pct_counts(spark, sf_dir):
    """Explicit-counts twin of the 1% shape — the pre-r13 default.
    Since the r13 flip the REGISTERED small-delta query auto-resolves
    to positional, so the counts side of the same-day control must be
    pinned explicitly here (the registered form no longer is one)."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import dedup as DD
    from activedata_etl_spark.io import load_table
    from activedata_etl_spark.queries.q_ext9 import _PLANT_ID, _stable_index

    d = load_table(spark, sf_dir, "documents")
    path, order_path = _stable_index(spark, sf_dir, d)
    has_sh = F.size(DD.shingles(DD.tokens(F.col("text")), 3)) > 0
    anchor = (d.filter((F.pmod("doc_id", F.lit(4)) == 0) & has_sh)
              .orderBy("doc_id").limit(1)
              .select(F.lit(_PLANT_ID).cast("long").alias("doc_id"),
                      "text"))
    delta = (d.filter(F.pmod("doc_id", F.lit(100)) == 1)
             .select("doc_id", "text").unionByName(anchor))
    return DD.prefix_join_stable_delta(spark, path, order_path, delta,
                                       "doc_id", "text", threshold=0.5,
                                       verify="counts")


# family -> (delta callable, full-rerun twin: registered name OR callable)
REALISTIC = {
    "minhash_1pct": (_minhash_1pct_delta, "dedup_lsh_jaccard_pairs"),
    # delta = positional 1% shape, "full" = the explicit counts twin
    # (a twin comparison, not a delta-vs-rerun one)
    "prefix_1pct_positional": (_prefix_1pct_positional,
                               _prefix_1pct_counts),
    # r13 default-flip control: the REGISTERED 1% query (now resolving
    # verify=None → positional) vs the explicit counts twin — the
    # "1%-nightly same-day control not regressed" acceptance
    "prefix_1pct_default": (
        lambda spark, sf_dir: __import__(
            "activedata_etl_spark.queries", fromlist=["QUERIES"]
        ).QUERIES["dedup_prefix_stable_small_delta"](spark, sf_dir),
        _prefix_1pct_counts),
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

    only = None
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    for a in sys.argv[1:]:
        if a.startswith("--families="):
            only = set(a.split("=", 1)[1].split(","))
    spark = get_spark("delta_sf1")
    out: dict = {"delta": {}, "auto": {}, "realistic": {}}
    for fam, (delta_q, full_q) in DELTA_FAMILIES.items():
        if only and fam not in only:
            continue
        out["delta"][fam] = {}
        for scale, sf_dir in SCALES.items():
            rec = {
                "delta": time_query(spark, QUERIES[delta_q], sf_dir),
                "full": time_query(spark, QUERIES[full_q], sf_dir),
            }
            out["delta"][fam][scale] = rec
            print(json.dumps({"family": fam, "scale": scale, **rec}),
                  flush=True)
    for fam, (delta_fn, full_q) in REALISTIC.items():
        if only and fam not in only:
            continue
        out["realistic"][fam] = {}
        for scale, sf_dir in SCALES.items():
            full_fn = QUERIES[full_q] if isinstance(full_q, str) else full_q
            rec = {
                "delta": time_query(spark, delta_fn, sf_dir),
                "full": time_query(spark, full_fn, sf_dir),
            }
            out["realistic"][fam][scale] = rec
            print(json.dumps({"family": fam, "scale": scale, **rec}),
                  flush=True)
    for fam, (fixed_q, auto_q) in AUTO_PAIRS.items():
        if only and fam not in only:
            continue
        out["auto"][fam] = {}
        for scale, sf_dir in SCALES.items():
            rec = {
                "fixed": time_query(spark, QUERIES[fixed_q], sf_dir),
                "auto": time_query(spark, QUERIES[auto_q], sf_dir),
            }
            out["auto"][fam][scale] = rec
            print(json.dumps({"family": fam, "scale": scale, **rec}),
                  flush=True)
    dest = args[0] if args else "/tmp/delta_sf1.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"done": True, "out": dest}))


if __name__ == "__main__":
    main()

"""Band/cosine family at 1x vs the 10x rig, with shuffle bytes
(VERDICT r13 #2): the r13 verify-join elimination made vectors ride the
bucket exchange n_bands x — this records the post-change wall ratios
(against the r8-era rig table: bulk 2.8x, semantic_banded 4.0x,
band_index 6.1x, lm_quality 4.0x) and the actual shuffle volume, read
from the local UI REST API as the delta of total shuffle write bytes
across each query's timed run.

Protocol: per (query, scale) one untimed warm-up (index/canon builds),
then 3 timed full materializations (median/min). Fresh session per
scale. Usage: python scripts/band_sf1_r14.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES_UNDER_TEST = os.environ.get(
    "BAND_SF1_ONLY",
    "dedup_embedding_cosine_bulk,dedup_semantic_banded_pairs,"
    "sim_band_index_pairs,dedup_lsh_jaccard_pairs,"
    "text_lm_quality_score").split(",")

SCALES = {"1x": "/root/testdata/sf0.1",
          "10x": "/tmp/spark_graft_bench/sf1"}


def shuffle_write_bytes(ui: str) -> int:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    total = 0
    for s in json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete")):
        total += s.get("shuffleWriteBytes", 0)
    return total


def main() -> None:
    import subprocess

    out = {}
    for scale, sf in SCALES.items():
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "one", sf], capture_output=True, text=True,
                           timeout=3600)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        out[scale] = json.loads(line[-1]) if line else {
            "error": (p.stderr or "")[-800:]}
        print(scale, json.dumps(out[scale]), flush=True)
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "scripts", "band_sf1_r14.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)


def one(sf: str) -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from pyspark.sql import SparkSession

    # the engine session disables the UI; this measurement needs the
    # REST metrics, so pre-seed the builder before get_spark's
    # getOrCreate picks the confs up
    SparkSession.builder.config("spark.ui.enabled", "true")
    from activedata_etl_spark import session as S
    S.DEFAULT_CONFS = {**S.DEFAULT_CONFS, "spark.ui.enabled": "true"}
    from activedata_etl_spark.queries import QUERIES
    from activedata_etl_spark.session import get_spark

    spark = get_spark("band_sf1_r14")
    ui = spark.sparkContext.uiWebUrl
    res = {}
    for name in QUERIES_UNDER_TEST:
        spark.sparkContext.setJobDescription(f"band_sf1:{name}")
        df = QUERIES[name](spark, sf)
        df.count()  # warm-up: canon persists / index builds
        runs, sh = [], []
        for _ in range(3):
            b0 = shuffle_write_bytes(ui)
            t0 = time.time()
            df.count()
            runs.append(round(time.time() - t0, 3))
            sh.append(shuffle_write_bytes(ui) - b0)
        res[name] = {"med": sorted(runs)[1], "min": min(runs),
                     "shuffle_write_bytes": sorted(sh)[1]}
        print(f"  {name}: {res[name]}", file=sys.stderr, flush=True)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        one(sys.argv[2])
    else:
        main()

"""Streaming-maintenance throughput at 1x and 10x (VERDICT r9 #7).

Every persisted index family has streaming APPEND tests (correctness:
replay idempotence, retract, compaction) but r9 recorded no throughput
numbers. This runs the real file-queue incremental pipeline — the
SQS-worker restatement from streaming/stream.py: inbox files are todo
items, foreachBatch appends to the persisted index, checkpoint commits
offsets — over N batches of ~1% of the corpus each, with
maxFilesPerTrigger=1 so each batch is one micro-batch, and records
per-batch wall + rows/s into SCALE.md's streaming table.

What the number means at 100 TB: per-batch wall is the nightly-ingest
unit cost. It must be DELTA-sized (tokenize/hash the batch + one
append write), never index-sized — a family whose per-batch wall grows
with the number of batches already ingested has a read-modify-write
hiding in its append path.

Protocol: base index built from 90% of the corpus (untimed), then 5
batches of 1% streamed through the pipeline. The machine must be idle.

Usage: python scripts/measure_stream_sf1.py [out_json] [--families=a,b]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALES = {
    "1x": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    "10x": os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_bench/sf1"),
}
N_BATCHES = 5


def _families():
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import dedup as DD
    from activedata_etl_spark.ext import dedup_index as DI
    from activedata_etl_spark.ext import multimodal as MM
    from activedata_etl_spark.ext import similarity as SIM
    from activedata_etl_spark.ext import text as TX

    def docs(spark, sf_dir):
        from activedata_etl_spark.io import load_table
        return load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def vecs(spark, sf_dir):
        from activedata_etl_spark.io import load_table
        return (load_table(spark, sf_dir, "embeddings")
                .select(F.col("vec_id").alias("id"), "embedding"))

    # family -> (source fn, key col, append(batch_df, batch_id, path))
    return {
        "bm25": (docs, "doc_id", lambda b, bid, p: TX.append_bm25_index(
            b, "doc_id", "text", p, bid)),
        "minhash": (docs, "doc_id", lambda b, bid, p: DI.append_to_index(
            b, "doc_id", "text", p)),
        "chunk": (docs, "doc_id", lambda b, bid, p: DD.append_chunk_index(
            b, "doc_id", "text", p)),
        "ahash": (docs, "doc_id", lambda b, bid, p: MM.append_ahash_index(
            b, "doc_id", "text", p)),
        "band": (vecs, "id", lambda b, bid, p: SIM.append_to_band_index(
            b, "id", "embedding", p)),
        "pq": (vecs, "id", lambda b, bid, p: _pq().append_pq_codes(
            b, "id", "embedding", b.sparkSession, p)),
    }


def _pq():
    from activedata_etl_spark.ext import pq
    return pq


def _build_base(fam, source, key, append, spark, sf_dir, path):
    """90% of the corpus as the pre-existing index (one untimed append;
    minhash uses its bulk builder so the 10x index is the v2 bucketed
    layout the delta path expects)."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import dedup_index as DI

    base = source(spark, sf_dir).filter(F.pmod(key, F.lit(100)) >= 10)
    t0 = time.perf_counter()
    if fam == "minhash":
        DI.build_index(base, "doc_id", "text", path)
    elif fam == "pq":
        _pq().build_pq_index(base, "id", "embedding", path)
    else:
        append(base, 0, path)
    return round(time.perf_counter() - t0, 3)


def run_family(fam, spark, sf_dir, workdir):
    from pyspark.sql import functions as F

    from activedata_etl_spark.streaming import stream as ST

    source, key, append = _families()[fam]
    src = source(spark, sf_dir)
    path = os.path.join(workdir, f"{fam}_idx")
    inbox = os.path.join(workdir, f"{fam}_inbox")
    build = _build_base(fam, source, key, append, spark, sf_dir, path)

    # one coalesced file per 1% batch => one micro-batch each under
    # maxFilesPerTrigger=1
    rows_per_batch = []
    for i in range(N_BATCHES):
        b = src.filter(F.pmod(key, F.lit(100)) == i)
        rows_per_batch.append(b.count())
        b.coalesce(1).write.mode("append").parquet(inbox)

    walls = []

    def ingest(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        t0 = time.perf_counter()
        append(batch_df, int(batch_id) + 1, path)
        walls.append(time.perf_counter() - t0)

    stream = (spark.readStream.format("parquet").schema(src.schema)
              .option("maxFilesPerTrigger", 1).load(inbox))
    t0 = time.perf_counter()
    ST.run_foreach_batch(stream, ingest, os.path.join(workdir, f"{fam}_ckpt")
                         ).awaitTermination(600)
    drain = time.perf_counter() - t0
    total_rows = sum(rows_per_batch)
    walls.sort()
    med = walls[len(walls) // 2] if walls else float("nan")
    return {
        "base_build_s": build,
        "batches": len(walls),
        "rows_total": total_rows,
        "batch_wall_median_s": round(med, 3),
        "batch_wall_max_s": round(max(walls), 3) if walls else None,
        "drain_wall_s": round(drain, 3),
        "rows_per_s": round(total_rows / drain, 1) if drain else None,
    }


def main() -> None:
    from activedata_etl_spark.session import get_spark

    only = None
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    for a in sys.argv[1:]:
        if a.startswith("--families="):
            only = set(a.split("=", 1)[1].split(","))
    spark = get_spark("stream_sf1")
    out: dict = {}
    for fam in _families():
        if only and fam not in only:
            continue
        out[fam] = {}
        for scale, sf_dir in SCALES.items():
            if not os.path.isdir(sf_dir):
                print(json.dumps({"family": fam, "scale": scale,
                                  "skipped": f"missing {sf_dir}"}), flush=True)
                continue
            workdir = tempfile.mkdtemp(prefix=f"stream_{fam}_{scale}_")
            try:
                rec = run_family(fam, spark, sf_dir, workdir)
            finally:
                shutil.rmtree(workdir, ignore_errors=True)
            out[fam][scale] = rec
            print(json.dumps({"family": fam, "scale": scale, **rec}),
                  flush=True)
    dest = args[0] if args else "/tmp/stream_sf1.json"
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"done": True, "out": dest}))


if __name__ == "__main__":
    main()

"""CLI end-to-end (subprocess, the real user interface) + watermarked
streaming aggregation."""

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

from activedata_etl_spark.io import load_table
from activedata_etl_spark.streaming.stream import file_stream, windowed_counts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_runs_query(tmp_path, sf_dir):
    qfile = tmp_path / "q.json"
    qfile.write_text(json.dumps({
        "from": "nation",
        "groupby": "n_regionkey",
        "select": [{"name": "n", "aggregate": "count"}],
        "format": "table",
    }))
    out = subprocess.run(
        [sys.executable, "-m", "activedata_etl_spark.cli",
         "--query", str(qfile), "--data", sf_dir],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout)
    assert set(result["header"]) == {"n_regionkey", "n"}
    assert sum(row[result["header"].index("n")] for row in result["data"]) == 25


def test_watermarked_windowed_counts(spark, sf_dir, tmp_path):
    src, ckpt, out = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    events = load_table(spark, sf_dir, "events").select("ts", "event_type")
    events.write.parquet(src)

    counts = windowed_counts(
        file_stream(spark, src, events.schema), "ts", "1 day", "2 hours", ["event_type"])
    q = (counts.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    # append mode emits only windows finalized by the watermark; every
    # emitted (window, type) count must equal the batch truth
    truth = events.groupBy(F.window("ts", "1 day").alias("window"), "event_type").count()
    j = got.alias("g").join(truth.alias("t"),
                            (F.col("g.window") == F.col("t.window"))
                            & (F.col("g.event_type") == F.col("t.event_type")))
    assert got.count() > 0
    assert j.filter(F.col("g.count") != F.col("t.count")).count() == 0


def test_cli_invalid_query_paths(tmp_path, capsys):
    """CLI pre-flight validation: shape errors print the offending jx
    path and exit 2 BEFORE any Spark session spins up."""
    import json

    from activedata_etl_spark.cli import main

    qf = tmp_path / "bad.json"
    qf.write_text(json.dumps({"from": "nation",
                              "where": {"eeq": {"x": 1}},
                              "skip": 3}))
    rc = main(["--query", str(qf), "--data", "/root/testdata/sf0.001"])
    err = capsys.readouterr().err
    assert rc == 2
    assert "where.eeq" in err and "skip" in err


def test_cli_parquet_bulk_extract(tmp_path, sf_dir, spark):
    """format=parquet writes the result DISTRIBUTED to --output (no
    driver collect) — the CLI's bulk path; values match the same query
    run in-process."""
    qfile = tmp_path / "q.json"
    qfile.write_text(json.dumps({
        "from": "orders",
        "where": {"gte": {"o_totalprice": 300000}},
        "select": ["o_orderkey", "o_custkey"],
    }))
    out_dir = tmp_path / "extract"
    out = subprocess.run(
        [sys.executable, "-m", "activedata_etl_spark.cli",
         "--query", str(qfile), "--data", sf_dir,
         "--format", "parquet", "--output", str(out_dir)],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout)["written"] == str(out_dir)
    got = spark.read.parquet(str(out_dir))
    want = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 300000).select("o_orderkey", "o_custkey")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # parquet without a destination is a clear CLI error, not a crash
    bad = subprocess.run(
        [sys.executable, "-m", "activedata_etl_spark.cli",
         "--query", str(qfile), "--data", sf_dir, "--format", "parquet"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert bad.returncode == 2 and "--output" in bad.stderr

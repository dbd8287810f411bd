"""Persisted dedup index (ext/dedup_index.py): index-backed near-dup must
equal the direct pipeline, and incremental append must equal a full build."""

import os

from pyspark.sql import functions as F

from activedata_etl_spark.ext import dedup as DD
from activedata_etl_spark.ext import dedup_index as DI

PARAMS = dict(n_hashes=16, n_bands=4, shingle_n=3)
THRESHOLD = 0.2


def _docs(spark, sf_dir, n=300):
    return (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .filter(F.col("doc_id") < n).select("doc_id", "text"))


def _pairs_set(df):
    return {(r.id_a, r.id_b, round(r.jaccard, 9)) for r in df.collect()}


def test_index_matches_direct_pipeline(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    idx = str(tmp_path / "idx")
    DI.build_index(docs, "doc_id", "text", idx, **PARAMS)

    direct = DD.near_dup_pairs(docs, "doc_id", "text", threshold=THRESHOLD, **PARAMS)
    from_idx = DI.near_dup_pairs_from_index(spark, idx, threshold=THRESHOLD)
    assert _pairs_set(from_idx) == _pairs_set(direct)
    assert len(_pairs_set(from_idx)) > 0  # corpus has known near-dups

    # Signature table is small and self-describing: id + 16 hashes + 4 bands.
    sig = DI.read_signatures(spark, idx)
    assert set(sig.columns) == {"id", *[f"h{i}" for i in range(16)],
                                *[f"band_{b}" for b in range(4)]}
    assert sig.count() <= docs.count()  # docs shorter than shingle_n drop out


def test_incremental_append_equals_full_build(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)

    inc = str(tmp_path / "inc")
    DI.build_index(old, "doc_id", "text", inc, **PARAMS)

    # The nightly-ingest query: delta vs index, BEFORE appending.
    delta_pairs = DI.pairs_against_index(new, "doc_id", "text", spark, inc,
                                         threshold=THRESHOLD, **PARAMS)
    full = str(tmp_path / "full")
    DI.build_index(docs, "doc_id", "text", full, **PARAMS)
    all_pairs = _pairs_set(DI.near_dup_pairs_from_index(spark, full, THRESHOLD))
    old_pairs = _pairs_set(DD.near_dup_pairs(old, "doc_id", "text",
                                             threshold=THRESHOLD, **PARAMS))
    # delta ∪ old-only == full corpus pairs (delta covers new-new and new-old)
    assert _pairs_set(delta_pairs) | old_pairs == all_pairs

    # After append, the index serves the whole corpus identically to a
    # from-scratch build (md5 determinism).
    DI.append_to_index(new, "doc_id", "text", inc, **PARAMS)
    assert _pairs_set(DI.near_dup_pairs_from_index(spark, inc, THRESHOLD)) == all_pairs

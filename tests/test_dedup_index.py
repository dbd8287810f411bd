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


def _touching(pairs, ids):
    return {p for p in pairs if p[0] in ids or p[1] in ids}


def test_lookup_regime_equals_direct(spark, sf_dir, tmp_path, monkeypatch):
    """A TINY delta (the 'is this batch already in the corpus' shape)
    takes the v2 lookup regime — literal (band_idx, sbkt, band_sig IN)
    predicates pushed onto the stored reads — and must return exactly
    the delta-touching pairs of a from-scratch run over old ∪ delta.
    The dir-budget gate is forced open so the literal path is the one
    under test regardless of how many directories this corpus hits."""
    monkeypatch.setattr(DI, "_LOOKUP_DIR_BUDGET", 1.0)
    docs = _docs(spark, sf_dir, n=500)
    old = docs.filter(F.col("doc_id") % 20 != 1)
    new = docs.filter(F.col("doc_id") % 20 == 1)  # 5% delta → lookup
    idx = str(tmp_path / "idx")
    DI.build_index(old, "doc_id", "text", idx, **PARAMS)

    got = DI.pairs_against_index(new, "doc_id", "text", spark, idx,
                                 threshold=THRESHOLD, **PARAMS)
    # the v2 layout must support directory pruning for the lookup
    # regime's literal predicates: a (band_idx, sbkt) filter over the
    # stored band table reaches the scan as PartitionFilters (the
    # delta query's own plan is hidden behind its localCheckpoint, so
    # the layout property is asserted on the stored read directly)
    import os as _os
    bands = spark.read.parquet(_os.path.join(idx, "bands"))
    plan = (bands.filter((F.col("band_idx") == 0) & (F.col("sbkt") == 3))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan
    assert "band_idx" in plan.split("PartitionFilters", 1)[1][:400]

    want = _touching(
        _pairs_set(DD.near_dup_pairs(docs, "doc_id", "text",
                                     threshold=THRESHOLD, **PARAMS)),
        {r.doc_id for r in new.select("doc_id").collect()})
    assert _pairs_set(got) == want and len(want) > 0


def test_batch_regime_equals_direct(spark, sf_dir, tmp_path, monkeypatch):
    """Forcing the middle (batch) regime — delta too big for literal
    pushdown, too small for the bulk lazy plan — by pinning _SEEK_CAP
    to 0: the stored band table scans unfiltered but the verify stage
    still semi-joins to candidate ids. Same answer as the lookup run."""
    docs = _docs(spark, sf_dir, n=500)
    old = docs.filter(F.col("doc_id") % 20 != 1)
    new = docs.filter(F.col("doc_id") % 20 == 1)
    idx = str(tmp_path / "idx")
    DI.build_index(old, "doc_id", "text", idx, **PARAMS)

    monkeypatch.setattr(DI, "_LOOKUP_CAP", 0)
    monkeypatch.setattr(DI, "_SEEK_CAP", 0)
    got = DI.pairs_against_index(new, "doc_id", "text", spark, idx,
                                 threshold=THRESHOLD, **PARAMS)
    want = _touching(
        _pairs_set(DD.near_dup_pairs(docs, "doc_id", "text",
                                     threshold=THRESHOLD, **PARAMS)),
        {r.doc_id for r in new.select("doc_id").collect()})
    assert _pairs_set(got) == want and len(want) > 0


def test_purge_from_index_right_to_be_forgotten(spark, sf_dir, tmp_path):
    """purge_from_index must leave the index serving EXACTLY what a
    fresh build on the remaining corpus serves (pairs, candidates,
    signatures), rewrite only the directories the purged ids live in,
    and decrement the doc count."""
    import os as _os

    docs = _docs(spark, sf_dir, n=400)
    victims = [r.doc_id for r in docs.filter(F.col("doc_id") % 7 == 0)
               .select("doc_id").collect()][:20]
    idx = str(tmp_path / "idx")
    DI.build_index(docs, "doc_id", "text", idx, **PARAMS)
    before_meta = DI._load_meta(idx)

    # untouched band dirs must keep their bytes (no full-index rewrite)
    def _mtimes(root):
        out = {}
        for dp, _, fns in _os.walk(root):
            for fn in fns:
                p = _os.path.join(dp, fn)
                out[p] = _os.path.getmtime(p)
        return out

    bands_before = _mtimes(_os.path.join(idx, "bands"))
    n = DI.purge_from_index(spark, idx, victims)
    assert n > 0
    bands_after = _mtimes(_os.path.join(idx, "bands"))
    untouched = set(bands_before) & set(bands_after)
    assert untouched, "purge rewrote every band file"
    assert any(bands_before[p] == bands_after[p] for p in untouched)

    survivors = docs.join(
        spark.createDataFrame([(v,) for v in victims], "doc_id long"),
        "doc_id", "left_anti")
    fresh = str(tmp_path / "fresh")
    DI.build_index(survivors, "doc_id", "text", fresh, **PARAMS)
    assert _pairs_set(DI.near_dup_pairs_from_index(spark, idx, THRESHOLD)) \
        == _pairs_set(DI.near_dup_pairs_from_index(spark, fresh, THRESHOLD))
    # no forgotten id anywhere
    sig_ids = {r.id for r in DI.read_signatures(spark, idx)
               .select("id").collect()}
    set_ids = {r.id for r in DI.read_shingle_sets(spark, idx)
               .select("id").collect()}
    assert not (set(victims) & (sig_ids | set_ids))
    after_meta = DI._load_meta(idx)
    assert after_meta["n_docs"] < before_meta["n_docs"]
    # the delta query keeps working against the purged index
    delta = docs.filter(F.col("doc_id") % 20 == 1)
    got = DI.pairs_against_index(delta, "doc_id", "text", spark, idx,
                                 threshold=THRESHOLD, **PARAMS)
    assert not any((r.id_a in set(victims)) or (r.id_b in set(victims))
                   for r in got.collect())


def test_compact_index_read_invisible(spark, sf_dir, tmp_path):
    """After several appends each touched directory holds several small
    files; compact_index folds every multi-file directory to ONE
    re-sorted file without changing any served answer."""
    import glob as _glob
    import os as _os

    docs = _docs(spark, sf_dir, n=400)
    idx = str(tmp_path / "idx")
    DI.build_index(docs.filter(F.col("doc_id") % 3 == 0),
                   "doc_id", "text", idx, **PARAMS)
    for b in (1, 2):
        DI.append_to_index(docs.filter(F.col("doc_id") % 3 == b),
                           "doc_id", "text", idx, **PARAMS)

    def n_files(pat):
        return sum(len([f for f in _os.listdir(d) if f.startswith("part-")])
                   for d in _glob.glob(pat))

    bands_pat = _os.path.join(idx, "bands", "band_idx=*", "sbkt=*")
    before_files = n_files(bands_pat)
    before_pairs = _pairs_set(DI.near_dup_pairs_from_index(spark, idx,
                                                           THRESHOLD))
    delta = docs.filter(F.col("doc_id") % 20 == 1)
    before_delta = _pairs_set(DI.pairs_against_index(
        delta, "doc_id", "text", spark, idx, threshold=THRESHOLD, **PARAMS))

    n = DI.compact_index(spark, idx)
    assert n > 0
    after_files = n_files(bands_pat)
    assert after_files < before_files
    # every leaf dir now holds exactly one data file
    for d in _glob.glob(bands_pat):
        assert len([f for f in _os.listdir(d)
                    if f.startswith("part-")]) == 1
    assert _pairs_set(DI.near_dup_pairs_from_index(spark, idx, THRESHOLD)) \
        == before_pairs
    assert _pairs_set(DI.pairs_against_index(
        delta, "doc_id", "text", spark, idx, threshold=THRESHOLD,
        **PARAMS)) == before_delta
    # idempotent: a second compaction finds nothing to fold
    assert DI.compact_index(spark, idx) == 0


def test_purge_string_keyed_index(spark, sf_dir, tmp_path):
    """Ids keep their native type through a purge (r10 review: the old
    int() coercion crashed on string keys — or worse, null-joined and
    reported success without forgetting anything)."""
    docs = (_docs(spark, sf_dir, n=200)
            .select(F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))
                    .alias("doc_id"), "text"))
    idx = str(tmp_path / "idx")
    DI.build_index(docs, "doc_id", "text", idx, **PARAMS)
    victims = [r.doc_id for r in docs.limit(5).collect()]
    n = DI.purge_from_index(spark, idx, victims)
    assert n > 0
    left = {r.id for r in DI.read_signatures(spark, idx)
            .select("id").collect()}
    assert not (set(victims) & left)
    # replayed purge: true no-op
    assert DI.purge_from_index(spark, idx, victims) == 0
    # absent ids: no rewrite, no false success
    assert DI.purge_from_index(spark, idx, ["doc-999999"]) == 0


def test_interrupted_swap_self_heals(spark, sf_dir, tmp_path):
    """iosafe.adopt_orphans finishes an interrupted rewrite: an orphan
    temp with a missing destination IS the complete new data (swap
    crashed between rmtree and rename); one with a live destination is
    pre-swap garbage."""
    import os as _os
    import shutil as _shutil

    from activedata_etl_spark.ext.iosafe import adopt_orphans

    docs = _docs(spark, sf_dir, n=200)
    idx = str(tmp_path / "idx")
    DI.build_index(docs, "doc_id", "text", idx, **PARAMS)
    before = _pairs_set(DI.near_dup_pairs_from_index(spark, idx, THRESHOLD))

    sets_root = _os.path.join(idx, "shingle_sets")
    leaf = sorted(d for d in _os.listdir(sets_root)
                  if d.startswith("ibkt="))[0]
    dest = _os.path.join(sets_root, leaf)
    orphan = _os.path.join(sets_root, "_rewrite_tmp", leaf)
    _os.makedirs(_os.path.dirname(orphan), exist_ok=True)
    # simulate a crash mid-swap: new data fully written, dest removed
    _shutil.copytree(dest, orphan)
    _shutil.rmtree(dest)
    assert adopt_orphans(idx) == 1
    assert _os.path.isdir(dest) and not _os.path.isdir(orphan)
    assert _pairs_set(DI.near_dup_pairs_from_index(spark, idx,
                                                   THRESHOLD)) == before
    # pre-swap garbage: dest still present -> orphan dropped
    _shutil.copytree(dest, orphan)
    assert adopt_orphans(idx) == 1
    assert _os.path.isdir(dest) and not _os.path.isdir(orphan)
    # and an orphan is INVISIBLE to readers while it exists
    _shutil.copytree(dest, orphan)
    assert _pairs_set(DI.near_dup_pairs_from_index(spark, idx,
                                                   THRESHOLD)) == before

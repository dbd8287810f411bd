"""Unit tests for extension ops not fully covered by the oracle pairs
(rows-only: simhash, multimodal decode stub)."""

import pytest
from pyspark.sql import functions as F

from activedata_etl_spark.ext import dedup as DD
from activedata_etl_spark.ext import multimodal as MM
from activedata_etl_spark.ext import text as TX
from activedata_etl_spark.io import load_table


def test_simhash_deterministic_and_near_dup_sensitive(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = dict(DD.simhash64(d, "doc_id", TX.tokens("text")).collect())
    b = dict(DD.simhash64(d.repartition(7), "doc_id", TX.tokens("text")).collect())
    assert a == b  # partition-layout independent

    # identical text ⇒ identical simhash (hamming 0)
    two = d.limit(1).select(F.lit(1).alias("id"), "text").unionByName(
        d.limit(1).select(F.lit(2).alias("id"), "text"))
    hs = [r["simhash"] for r in DD.simhash64(two, "id", TX.tokens("text")).collect()]
    assert hs[0] == hs[1]


def test_hamming64(spark):
    df = spark.range(1).select(
        DD.hamming64(F.lit(0b1011).cast("bigint"), F.lit(0b0010).cast("bigint")).alias("h"))
    assert df.first()["h"] == 2


def test_multimodal_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        MM.decode_stub(b"bytes", "image/png", fake=False)


def test_multimodal_resize_and_frames(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(5)
    mm = MM.pack(d, "doc_id", "text", "image/fake")
    resized = MM.resize(mm, 8, 4).collect()
    assert all(len(r["payload"]) == 32 and r["width"] == 8 for r in resized)
    frames = MM.frame_sample(mm, every_n_bytes=16, max_frames=3)
    rows = frames.collect()
    assert len(rows) == 15  # 5 docs × 3 frames (texts are long enough)
    assert {r["frame_idx"] for r in rows} == {0, 1, 2}


def test_multimodal_feature_batch_shape(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(10)
    feats = MM.extract_features(MM.pack(d, "doc_id", "text", "text/plain"), fake=True)
    rows = feats.collect()
    assert len(rows) == 10
    assert all(len(r["features"]) == MM.FEATURE_DIM for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["features"])


def test_lsh_bucket_size_cap(spark):
    from activedata_etl_spark.ext.dedup import lsh_candidate_pairs

    # 10 identical boilerplate docs (one mega-bucket in every band) + 2
    # near-dup "real" docs. With the cap, boilerplate pairs disappear but
    # the small-bucket pair survives.
    boiler = [(i, "the quick brown fox jumps over the lazy dog again and again") for i in range(10)]
    real = [(100, "completely different unique text about spark query engines at scale"),
            (101, "completely different unique text about spark query engines at large scale")]
    df = spark.createDataFrame(boiler + real, "doc_id long, text string")

    uncapped = lsh_candidate_pairs(df, "doc_id", "text").collect()
    assert len(uncapped) >= 45  # C(10,2) boilerplate pairs at minimum

    capped = {(r.id_a, r.id_b) for r in
              lsh_candidate_pairs(df, "doc_id", "text", max_bucket_size=5).collect()}
    assert all(a >= 100 for a, _ in capped), f"boilerplate pairs leaked: {capped}"
    assert (100, 101) in capped


def test_ivf_recall_vs_brute(spark, sf_dir):
    """IVF with nprobe=4/nlist=16 should recover most of the brute-force
    top-3 (structural sanity: buckets are real clusters, not noise)."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import similarity as SIM
    from activedata_etl_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    brute = SIM.cosine_topk(q, emb, "q_id", "q_vec", "vec_id", "embedding", k=3)
    cent, assign = SIM.ivf_build(emb, "vec_id", "embedding", nlist=16, n_iter=2)
    ivf = SIM.ivf_topk(q, cent, assign, "q_id", "q_vec", "vec_id", k=3, nprobe=4)
    truth = {(r.q_id, r.vec_id) for r in brute.collect()}
    got = {(r.q_id, r.vec_id) for r in ivf.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"recall {recall}: IVF clusters look broken"


def test_chunk_tokens_edges(spark):
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import text as TX

    df = spark.createDataFrame(
        [("a b c d e f g",), ("a b",), ("",)], "t string")
    out = df.select(TX.chunk_tokens(TX.tokens("t"), window=4, stride=2).alias("c")).collect()
    # 7 tokens, window 4 stride 2 -> ceil((7-4)/2)+1 = 3 chunks
    assert [[len(ch) for ch in r.c] for r in out][0] == [4, 4, 3]
    assert out[0].c[1] == ["c", "d", "e", "f"]  # stride overlap
    assert [len(ch) for ch in out[1].c] == [2]  # short doc: one whole-doc chunk
    # empty string: split produces [''] (1 token) — one 1-token chunk, never a crash
    assert [len(ch) for ch in out[2].c] == [1]


def test_connected_components_chains_and_singles(spark):
    # Component {1,2,3} via a chain, component {7,9}; 5 never appears.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a bigint, id_b bigint")
    got = {(r.id, r.cluster_id)
           for r in DD.connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)}


def test_canonical_filter_keeps_min_and_unclustered(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 5, 7, 9)], "doc_id bigint, t string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a bigint, id_b bigint")
    kept = {r.doc_id
            for r in DD.canonical_filter(docs, pairs, "doc_id").collect()}
    assert kept == {1, 5, 7}


def test_connected_components_long_chain_converges(spark):
    # Path graph 0-1-2-...-9: worst-case diameter for label propagation.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a bigint, id_b bigint")
    rows = DD.connected_components(pairs).collect()
    assert {r.cluster_id for r in rows} == {0}
    assert len(rows) == 10


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    from activedata_etl_spark.ext import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    truth = {(r.q_id, r.vec_id) for r in SIM.cosine_topk(
        q, emb, "q_id", "q_vec", "vec_id", "embedding", k=3).collect()}
    single = {(r.q_id, r.vec_id) for r in SIM.ann_sign_lsh_topk(
        q, emb, "q_id", "q_vec", "vec_id", "embedding", k=3).collect()}
    multi = {(r.q_id, r.vec_id) for r in SIM.ann_multiprobe_topk(
        q, emb, "q_id", "q_vec", "vec_id", "embedding", k=3).collect()}
    # Multi-probe candidate sets are supersets per query, so its top-k can
    # only get closer to (or tie) the brute-force truth.
    assert len(multi & truth) >= len(single & truth)
    assert len(multi & truth) > 0


def test_jaccard_verify_forms_agree(spark, sf_dir):
    """Array-based and count-based Jaccard verify produce identical pairs
    and values (the counts form is the bounded-row-memory scale path)."""
    from activedata_etl_spark.ext import dedup as DD
    from activedata_etl_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    a = DD.near_dup_pairs(d, "doc_id", "text", threshold=0.2, verify="arrays")
    c = DD.near_dup_pairs(d, "doc_id", "text", threshold=0.2, verify="counts")
    ra = {(r.id_a, r.id_b): r.jaccard for r in a.collect()}
    rc = {(r.id_a, r.id_b): r.jaccard for r in c.collect()}
    assert ra == rc and len(ra) > 0


def test_canonical_vectors_prepass(spark, sf_dir):
    """Duplicated vectors collapse to one canonical row; cosine dedup on
    canonicals then scales with unique content (SCALE.md 10x lesson)."""
    from activedata_etl_spark.ext import similarity as SIM
    from activedata_etl_spark.io import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    doubled = e.unionByName(e.withColumn("vec_id", F.col("vec_id") + 10**6))
    canon = SIM.canonical_vectors(doubled, "vec_id", "embedding")
    assert canon.count() == n  # every copy collapsed to the low-id original
    assert canon.agg(F.max("vec_id")).collect()[0][0] < 10**6
    groups = SIM.exact_vector_dedup_groups(doubled, "vec_id", "embedding")
    assert groups.filter(F.col("n_copies") != 2).count() == 0


def test_containment_catches_subset_pairs(spark):
    """A short doc fully quoted inside a long one: Jaccard is low but
    containment C(short->long) = 1.0 — the contamination signal."""
    from activedata_etl_spark.ext import dedup as DD
    from pyspark.sql import functions as F

    short = " ".join(f"w{i}" for i in range(30))
    long_ = short + " " + " ".join(f"extra{i}" for i in range(4))
    two = spark.createDataFrame([(1, short), (2, long_)], "id bigint, text string")
    got = {(r.id_a, r.id_b): (r.c_ab, r.c_ba)
           for r in DD.containment_pairs(two, "id", "text", threshold=0.9).collect()}
    assert (1, 2) in got
    c_ab, c_ba = got[(1, 2)]
    assert c_ab == 1.0 and c_ba < 1.0  # fully contained; reverse is partial
    # a symmetric Jaccard gate at the same strictness misses the pair
    jac = DD.near_dup_pairs(two, "id", "text", threshold=0.9)
    assert jac.count() == 0


def test_chunk_dedup_finds_boilerplate(spark):
    # Inject a repeated 10-token "nav bar" into 3 of 4 docs: those chunks
    # must be flagged, the unique doc keeps everything.
    boiler = " ".join(f"nav{i}" for i in range(10))
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(10))  # noqa: E731
    rows = [(i, boiler + " " + uniq(f"u{i}")) for i in range(3)]
    rows.append((9, uniq("only") + " " + uniq("more")))
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in
           DD.chunk_dedup_stats(df, "doc_id", "text", chunk=10, min_docs=2).collect()}
    for i in range(3):
        assert out[i]["n_chunks"] == 2 and out[i]["n_dup_chunks"] == 1
        assert out[i]["kept_tokens"] == 10
    assert out[9]["n_dup_chunks"] == 0 and out[9]["kept_tokens"] == 20


def test_gopher_rules_reject_reasons(spark):
    rows = [
        (1, "the be to of and words " + " ".join(f"w{i}" for i in range(20))),  # keep
        (2, "the be short doc"),                                    # too few words
        (3, " ".join(["the be"] + ["spam"] * 40)),                  # dup-2gram heavy
        (4, " ".join(f"w{i}" for i in range(30))),                  # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in
           df.select("doc_id", *TX.gopher_metrics("text"))
             .withColumn("keep", TX.gopher_keep()).collect()}
    assert out[1]["keep"] and out[1]["stop_hits"] >= 5
    assert not out[2]["keep"]
    assert not out[3]["keep"] and out[3]["dup_2gram"] > 0.85
    assert not out[4]["keep"] and out[4]["stop_hits"] == 0


def test_semantic_dedup_drops_injected_copies(spark):
    from activedata_etl_spark.ext import similarity as SIM

    # two well-separated directions in R^4; three near-identical members
    # around the first, two around the second, plus one outlier per cluster
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),
        (2, [0.998, 0.0, 0.02, 0.0]),
        (3, [0.5, 0.5, 0.5, 0.5]),        # same halfspace, far from rep
        (10, [0.0, 0.0, 1.0, 0.0]),
        (11, [0.0, 0.01, 0.999, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = {r["vec_id"]: r for r in
           SIM.semantic_dedup(df, "vec_id", "embedding",
                              nlist=2, n_iter=2, threshold=0.95).collect()}
    assert len(out) == 6
    reps = {r["rep_id"] for r in out.values()}
    # every rep keeps itself; near-copies of a rep are dropped
    for rid in reps:
        assert out[rid]["keep"]
    dropped = {i for i, r in out.items() if not r["keep"]}
    kept = {i for i, r in out.items() if r["keep"]}
    assert dropped, "near-identical members must be dropped"
    assert 3 in kept  # the far member survives a 0.95 ball
    # all dropped members are ~duplicates of their cluster rep
    assert all(out[i]["cos_rep"] >= 0.95 for i in dropped)


def test_triangle_stats_known_graph(spark):
    from activedata_etl_spark.ext import graph as GR

    # K4 on {1,2,3,4} plus pendant 4-5: each K4 node is in 3 triangles
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 5)], "a: long, b: long")
    out = {r["node"]: r for r in GR.triangle_stats(edges).collect()}
    for n in (1, 2, 3):
        assert out[n]["n_triangles"] == 3 and out[n]["clustering"] == 1.0
    assert out[4]["degree"] == 4 and out[4]["n_triangles"] == 3
    assert out[4]["clustering"] == 2.0 * 3 / (4 * 3)
    assert 5 not in out  # degree-1 nodes excluded


def test_cooccurrence_hot_slot_cap(spark):
    from activedata_etl_spark.ext import graph as GR

    # slot "hot" shared by 10 users (45 pairs), slot "cold" by 2
    rows = [(u, "hot") for u in range(10)] + [(100, "cold"), (101, "cold")]
    df = spark.createDataFrame(rows, "user_id: long, slot: string")
    uncapped = GR.cooccurrence_edges(df, "user_id", ["slot"], min_common=1)
    assert uncapped.count() == 45 + 1
    capped = GR.cooccurrence_edges(df, "user_id", ["slot"], min_common=1,
                                   max_slot_size=5)
    assert [tuple(r) for r in capped.select("a", "b").collect()] == [(100, 101)]


def test_tar_shard_sink_roundtrip(spark, sf_dir, tmp_path):
    import tarfile
    from activedata_etl_spark.sources.shards import (read_tar_shards,
                                                     write_tar_shards)

    d = load_table(spark, sf_dir, "documents").limit(40)
    d = d.withColumn("shard", (F.col("doc_id") % 4).cast("long")) \
         .withColumn("meta", F.to_json(F.struct("lang", "source")))
    path = str(tmp_path / "shards")
    write_tar_shards(d, path, "shard", "doc_id",
                     {"text": "txt", "meta": "json"})

    back = read_tar_shards(path)
    src = {str(r["doc_id"]): (r["text"], r["lang"]) for r in d.collect()}
    assert set(back) == set(src)
    for k, files in back.items():
        assert files["txt"].decode() == src[k][0]
        assert src[k][1] in files["json"].decode()
    # 4 shards, deterministic bytes: rewrite → identical archives
    import glob, hashlib
    tars = sorted(glob.glob(path + "/*.tar"))
    assert len(tars) == 4
    h1 = [hashlib.md5(open(t, "rb").read()).hexdigest() for t in tars]
    write_tar_shards(d.repartition(7), path, "shard", "doc_id",
                     {"text": "txt", "meta": "json"})
    h2 = [hashlib.md5(open(t, "rb").read()).hexdigest()
          for t in sorted(glob.glob(path + "/*.tar"))]
    assert h1 == h2
    # rewrite over FEWER shards clears stale archives (a smaller run must
    # not mix old shard-2/3 into the result) and leaves no attempt temps
    import os
    write_tar_shards(d.filter(F.col("shard") < 2), path, "shard", "doc_id",
                     {"text": "txt", "meta": "json"})
    left = sorted(os.path.basename(p) for p in glob.glob(path + "/*"))
    assert left == ["shard-0.tar", "shard-1.tar"]


def test_bpe_merges_hand_computed(spark):
    # Sennrich-style toy corpus; merges derivable by hand:
    # pair counts r1: lo=4, ow=4 (tie -> lhs 'l' wins), r2: lo+w=4,
    # r3: four pairs tie at 2 -> lexicographic (e,s)
    df = spark.createDataFrame(
        [("low low low lower",), ("newest newest",)], "text: string")
    got = [tuple(r) for r in
           TX.bpe_merges(df, "text", n_merges=3).orderBy("merge_rank").collect()]
    assert got == [(1, "l", "o", "lo", 4),
                   (2, "lo", "w", "low", 4),
                   (3, "e", "s", "es", 2)]


def test_hll_merge_equals_single_pass(spark, sf_dir):
    """Register merge over shards == registers of the union: the
    property that makes the persisted NDV index incremental."""
    from activedata_etl_spark.functions import hll

    o = load_table(spark, sf_dir, "orders")
    h1 = o.filter(F.col("o_orderkey") % 2 == 0)
    h2 = o.filter(F.col("o_orderkey") % 2 == 1)
    merged = hll.hll_merge(hll.hll_registers(h1, [], "o_orderkey"),
                           hll.hll_registers(h2, [], "o_orderkey"),
                           group_cols=[])
    single = hll.hll_registers(o, [], "o_orderkey")
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, single.collect()))
    assert a == b

    # estimate accuracy: 256 registers -> ~6.5% std err; assert 15%
    est = hll.hll_estimate(single, []).collect()[0]["raw_est"]
    exact = o.select("o_orderkey").distinct().count()
    assert abs(est - exact) / exact < 0.15


def test_multimodal_tar_export(spark, sf_dir, tmp_path):
    """Binary payload column through the tar sink: multimodal frames
    export as WebDataset samples (<id>.bin + <id>.json meta)."""
    from activedata_etl_spark.sources.shards import (read_tar_shards,
                                                     write_tar_shards)

    d = load_table(spark, sf_dir, "documents").limit(20)
    mm = MM.pack(d, "doc_id", "text", "application/fake")
    mm = mm.withColumn("shard", (F.col("id") % 2).cast("long")) \
           .withColumn("meta_json", F.to_json("meta"))
    path = str(tmp_path / "mmshards")
    write_tar_shards(mm, path, "shard", "id",
                     {"payload": "bin", "meta_json": "json"})
    back = read_tar_shards(path)
    src = {str(r["id"]): (bytes(r["payload"]), r["meta"]["checksum"])
           for r in mm.collect()}
    assert set(back) == set(src)
    for k, files in back.items():
        assert files["bin"] == src[k][0]          # bytes intact
        assert src[k][1] in files["json"].decode()  # checksum in meta


def test_int8_quantization_properties(spark, sf_dir):
    """Reconstruction error bounded by scale/2 per element; max-magnitude
    element hits ±127 exactly; quantized top-1 neighbor agrees with the
    exact top-1 for most queries (rank fidelity, not just value bounds)."""
    from activedata_etl_spark.ext import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qz = emb.select(
        "vec_id", SIM.quantize_int8(F.col("embedding")).alias("z"), "embedding")
    checked = qz.select(
        F.array_max(F.transform(F.col("z.q"), lambda x: F.abs(x))).alias("mx"),
        F.array_max(F.zip_with(
            F.col("embedding"), F.col("z.q"),
            lambda x, q: F.abs(x.cast("double") - q * F.col("z.scale"))
        )).alias("err"),
        (F.col("z.scale") / 2 + 1e-12).alias("bound"),
    ).collect()
    assert all(r["mx"] == 127 for r in checked)          # scale anchored
    assert all(r["err"] <= r["bound"] for r in checked)  # half-step bound

    # ε-approximate-NN fidelity. Exact RANK agreement is the wrong ask on
    # this fixture: random near-orthogonal vectors pack hundreds of
    # candidates within ~1% cosine of the true best, inside int8's noise
    # floor. The guarantee quantized search actually gives is that the
    # neighbor it picks is nearly as good as the true best — its EXACT
    # cosine within a small ε of the exact top-1's.
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    best = {r["q_id"]: r["cos"] for r in SIM.cosine_topk(
        queries, emb, "q_id", "q_vec", "vec_id", "embedding", k=1).collect()}
    from activedata_etl_spark.queries import QUERIES
    chosen = (QUERIES["sim_ann_quantized_topk"](spark, sf_dir)
              .groupBy("q_id")
              .agg(F.max_by("vec_id", F.struct(F.col("qcos"), -F.col("vec_id")))
                   .alias("vec_id")))
    got = (chosen.join(queries, "q_id")
           .join(emb, "vec_id")
           .select("q_id", SIM.cosine(F.col("q_vec"), F.col("embedding"))
                   .alias("cos")).collect())
    assert len(got) == 10
    for r in got:
        assert r["cos"] >= best[r["q_id"]] - 0.05, \
            f"q{r['q_id']}: chosen {r['cos']:.4f} vs best {best[r['q_id']]:.4f}"


def test_pagerank_star_graph(spark):
    """Star K1,3: center must outrank leaves; rank mass stays ~1 (no
    dangling mass on an undirected graph); leaves tie exactly."""
    from activedata_etl_spark.ext import graph as G

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "a bigint, b bigint")
    r = {row["node"]: row["r"]
         for row in G.pagerank(edges, n_iter=5).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert r[0] > r[1] and r[1] == r[2] == r[3]
    # exact against a sequential reference of the same algorithm
    # (same fold order: contributions summed in src order)
    adj = {0: [1, 2, 3], 1: [0], 2: [0], 3: [0]}
    ref = {n: 1.0 / 4 for n in adj}
    for _ in range(5):
        ref = {n: (1.0 - 0.85) / 4
               + 0.85 * sum(ref[s] / len(adj[s]) for s in sorted(adj[n]))
               for n in adj}
    assert r == ref


def test_cdc_chunks_survive_insertion(spark, sf_dir):
    """The CDC property, measured: prepend tokens to every document and
    compare chunk-hash survival. Fixed windows lose (almost) everything
    — every window shifts; content-defined boundaries re-synchronize
    within ~one chunk, so most hashes survive. This is why CDC dedup
    catches edited near-copies that fixed-window dedup misses."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import dedup as DD
    from activedata_etl_spark.io import load_table

    d = load_table(spark, sf_dir, "documents").limit(100)
    edited = d.withColumn("text", F.concat(F.lit("injected header xx "),
                                           F.col("text")))

    def survival(chunker, *args, **kw):
        a = chunker(d, "doc_id", "text", *args, **kw) \
            .select("doc_id", "h").distinct()
        b = chunker(edited, "doc_id", "text", *args, **kw) \
            .select("doc_id", "h").distinct()
        n_orig = a.count()
        n_kept = a.join(b, ["doc_id", "h"], "left_semi").count()
        return n_kept / n_orig

    cdc = survival(DD.cdc_chunk_table, window=4, mask=15)
    fixed = survival(DD.chunk_table, chunk=16)
    assert cdc > 0.6, f"CDC survival collapsed: {cdc:.2f}"
    assert fixed < 0.3, f"fixed-window survival unexpectedly high: {fixed:.2f}"
    assert cdc > fixed + 0.4


def test_exact_substring_spans_golden(spark):
    """Hand-built corpus with one planted 12-token repeat: window
    positions, merged-span arithmetic, and coverage are checked against
    hand-computed values (k=4)."""
    from activedata_etl_spark.ext.dedup import exact_substring_spans

    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12"
    docs = spark.createDataFrame([
        (1, f"a1 a2 {shared}"),            # repeat at positions 3..14
        (2, f"{shared} b1 b2 b3"),         # repeat at positions 1..12
        (3, "c1 c2 c3 c4 c5 c6 c7 c8"),    # no repeats
    ], "doc_id: long, text: string")
    got = {r["doc_id"]: r.asDict() for r in
           exact_substring_spans(docs, "doc_id", "text", k=4).collect()}
    # doc 1: 14 tokens, 11 windows; dup windows at p=3..11 (9 of them);
    # merged span covers the 12 shared tokens
    assert got[1]["n_tokens"] == 14 and got[1]["n_windows"] == 11
    assert got[1]["n_dup_windows"] == 9
    assert got[1]["covered_tokens"] == 12 and got[1]["n_spans"] == 1
    assert abs(got[1]["dup_token_share"] - 12 / 14) < 1e-12
    # doc 2: 15 tokens, 12 windows; dup windows p=1..9
    assert got[2]["n_dup_windows"] == 9
    assert got[2]["covered_tokens"] == 12 and got[2]["n_spans"] == 1
    # doc 3: clean
    assert got[3]["n_dup_windows"] == 0 and got[3]["covered_tokens"] == 0
    assert got[3]["n_spans"] == 0 and got[3]["dup_token_share"] == 0.0


def test_exact_substring_removal_golden(spark):
    """Canonical-survivor semantics, hand-checked (k=4): the earliest
    (doc, pos) occurrence of a duplicated run keeps its tokens; every
    other occurrence — in other docs or LATER IN THE SAME DOC — is cut;
    text outside duplicated spans is untouched."""
    from activedata_etl_spark.ext.dedup import exact_substring_removal

    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12"
    docs = spark.createDataFrame([
        (1, f"a1 a2 {shared}"),          # canonical holder (doc 1 < doc 2)
        (2, f"{shared} b1 b2 b3"),       # loses the shared run
        (3, "c1 c2 c3 c4 c5 c6 c7 c8"),  # untouched
        (4, "d1 r1 r2 r3 r4 d2 r1 r2 r3 r4 d3"),  # within-doc repeat
    ], "doc_id: long, text: string")
    got = {r["doc_id"]: r.asDict() for r in
           exact_substring_removal(docs, "doc_id", "text", k=4).collect()}
    assert got[1]["n_removed"] == 0 and got[1]["kept_text"] == f"a1 a2 {shared}"
    assert got[2]["n_removed"] == 12 and got[2]["kept_text"] == "b1 b2 b3"
    assert got[3]["n_removed"] == 0
    # doc 4: first r1..r4 (pos 2..5) is canonical; second (pos 7..10) cut
    assert got[4]["n_removed"] == 4
    assert got[4]["kept_text"] == "d1 r1 r2 r3 r4 d2 d3"


def test_bm25_golden_hand_computed(spark):
    """BM25 on a 3-doc corpus against hand-computed scores (k1=1.2,
    b=0.75, Robertson ratio idf): pins the integer rearrangement to the
    textbook formula."""
    import math

    from activedata_etl_spark.ext.text import bm25_topk

    docs = [(1, "cat dog cat"), (2, "dog bird"), (3, "fish bird bird cat")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_topk(df, "doc_id", "text", ["cat", "bird"], k=3).collect()}
    # reference: classic floats, then the same 1e-6 floor-quantization
    N, total = 3, 9
    avgdl = total / N
    dls = {1: 3, 2: 2, 3: 4}
    tfs = {1: {"cat": 2}, 2: {"bird": 1}, 3: {"cat": 1, "bird": 2}}
    dfreq = {"cat": 2, "bird": 2}
    want = {}
    for d in dls:
        s = 0
        for t, tf in tfs[d].items():
            idf = (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            term = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
            s += math.floor(term * 1e6)
        want[d] = s / 1e6
    for d in want:
        assert abs(got[d] - want[d]) < 2e-6, (d, got[d], want[d])


def test_priority_sample_properties(spark, sf_dir):
    """DLT priority sample invariants: exactly k rows, priorities are
    the k largest (≥ τ), est_weight = max(w, τ) ≥ w, and the sample is
    stable under repartitioning (hash-seeded, layout-free)."""
    from activedata_etl_spark.ext.sampling import priority_sample
    from activedata_etl_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    s1 = priority_sample(d, "doc_id", "n_chars", k=10, salt="t")
    rows = s1.collect()
    assert len(rows) == 10
    for r in rows:
        assert r["est_weight"] >= r["n_chars"]
        assert r["priority"] >= min(x["priority"] for x in rows)
    s2 = priority_sample(d.repartition(7), "doc_id", "n_chars",
                         k=10, salt="t").collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in s2)
    # a different salt draws a different sample (decorrelation)
    s3 = priority_sample(d, "doc_id", "n_chars", k=10, salt="u").collect()
    assert sorted(r["doc_id"] for r in rows) != sorted(r["doc_id"] for r in s3)


def test_knn_graph_symmetric_core(spark, sf_dir):
    """kNN graph sanity on the real fixture: per-src degree ≤ k, no
    self-loops, and every returned neighbor shares the src's cluster —
    plus determinism under repartitioning."""
    from activedata_etl_spark.ext.similarity import ivf_build, knn_graph
    from activedata_etl_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    g = knn_graph(emb, "vec_id", "embedding", k=3, nlist=4).collect()
    by_src = {}
    for r in g:
        assert r["src"] != r["dst"]
        by_src.setdefault(r["src"], []).append(r)
    assert all(len(v) <= 3 for v in by_src.values())
    _, assign = ivf_build(emb, "vec_id", "embedding", nlist=4)
    cid = {r["vec_id"]: r["cid"] for r in assign.collect()}
    for r in g:
        assert cid[r["src"]] == cid[r["dst"]]


def test_ahash_planted_near_dups(spark):
    """aHash must pair an exact copy at hamming 0 and a lightly-edited
    copy at small hamming, and must not pair a structurally different
    payload; bands are pure codegen (no shuffle until the pair join)."""
    from activedata_etl_spark.ext.multimodal import ahash_bands, ahash_pairs

    base = "the quick brown fox jumps over the lazy dog " * 3
    edited = "THE quick brown fox jumps over the lazy dog " * 3  # case flip
    other = "zzzzzz completely different content 0123456789 " * 3
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, edited), (4, other)], ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in ahash_pairs(df, "doc_id", "text", max_hamming=16).collect()}
    assert got.get((1, 2)) == 0
    assert (1, 3) in got and 0 < got[(1, 3)] <= 16
    assert not any(4 in p for p in got)
    # bands are deterministic under repartition
    b1 = sorted(map(tuple, ahash_bands(df, "doc_id", "text").collect()))
    b2 = sorted(map(tuple,
                    ahash_bands(df.repartition(3), "doc_id", "text").collect()))
    assert b1 == b2


def test_winnowing_guarantee_and_density(spark):
    """Schleimer et al.'s theorem, checked concretely: any shared token
    run of length ≥ w+k−1 (= 7 here) yields ≥1 shared fingerprint; and
    selection keeps far fewer than all k-gram hashes."""
    from activedata_etl_spark.ext.dedup import (winnowing_fingerprints,
                                                winnowing_pairs)

    shared_run = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    docs = [
        (1, "xx yy " + shared_run + " zz ww qq"),
        (2, "aa bb cc dd " + shared_run + " ee"),
        (3, "totally different words only here nothing matches at all"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs = winnowing_pairs(df, "doc_id", "text", k=4, w=4,
                            min_shared=1, max_df=None).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert not any(3 in p for p in got)
    # density: selections ≤ k-gram count, and dedup'd positions unique
    fp = winnowing_fingerprints(df, "doc_id", "text", k=4, w=4).collect()
    from collections import Counter

    per_doc = Counter(r["id"] for r in fp)
    n_tokens = {i: len(t.split()) for i, t in docs}
    for d_, n_sel in per_doc.items():
        assert n_sel < n_tokens[d_] - 3  # fewer than all k-grams
    assert len({(r["id"], r["fpos"]) for r in fp}) == len(fp)


def test_pagerank_production_sum_matches_fold(spark, sf_dir):
    """pagerank(deterministic=False) uses the plain shuffle SUM — same
    ranks as the oracle-parity fold within float-addition noise."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.ext import graph as G
    from activedata_etl_spark.io import load_table

    e = (load_table(spark, sf_dir, "events")
         .select("user_id", "event_type",
                 F.date_trunc("hour", "ts").alias("h")).distinct())
    edges = G.cooccurrence_edges(e, "user_id", ["event_type", "h"],
                                 min_common=3).select("a", "b")
    det = {r["node"]: r["r"]
           for r in G.pagerank(edges, n_iter=2).collect()}
    fast = {r["node"]: r["r"]
            for r in G.pagerank(edges, n_iter=2,
                                deterministic=False).collect()}
    assert det.keys() == fast.keys()
    assert all(abs(det[k] - fast[k]) < 1e-9 for k in det)


def test_banded_pairs_multi_band_agreement_emitted_once(spark, tmp_path):
    """r13 opt regression pin: the candidate `.distinct()` was replaced
    by the first-shared-band guard, so a pair agreeing on SEVERAL bands
    (the case the distinct used to collapse) must still be emitted
    exactly once — in both the inline and the index-served form."""
    from activedata_etl_spark.ext import similarity as SIM

    # dim 64 -> 4 bands x 16 bits. All cosines ~0.98+.
    v_a = [1.0] * 64                      # bands: 1111 (all-ones sigs)
    v_b = [-0.01] + [1.0] * 63           # band 0 differs, agrees on 3
    v_c = [1.0] * 63 + [2.0]             # agrees with v_a on all 4
    v_d = [1e-9] + [1.0] * 63            # quantizes identically to v_e,
    v_e = [-1e-9] + [1.0] * 63           # but band 0 sign bit differs
    rows = [(1, v_a), (2, v_b), (3, v_c), (4, v_d), (5, v_e)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    pairs = SIM.cosine_dedup_pairs(df, "vec_id", "embedding",
                                   threshold=0.95).collect()
    ids = [(r.id_a, r.id_b) for r in pairs]
    assert len(ids) == len(set(ids)), "pair emitted more than once"
    assert set(ids) == {(a, b) for a in range(1, 6)
                        for b in range(a + 1, 6)}

    # index-served twin: v_d/v_e share a quantized code, so their group
    # carries a band-0 sig UNION — the sorted-intersection guard must
    # still emit each cross-group pair once.
    idx = str(tmp_path / "band_idx")
    SIM.build_band_index(df, "vec_id", "embedding", idx)
    ipairs = SIM.pairs_from_band_index(spark, idx, threshold=0.95).collect()
    iids = [(r.id_a, r.id_b) for r in ipairs]
    assert len(iids) == len(set(iids)), "index pair emitted more than once"
    assert set(iids) == set(ids)


def test_lsh_cap_keeps_pair_from_later_shared_band(spark):
    """Cap-contract pin (r13): with max_bucket_size set, a pair whose
    FIRST shared band sits in an over-cap bucket must still surface
    from a later, under-cap shared band (the documented cap semantics —
    the uncapped exactly-once guard must not leak into the capped
    path). Uncapped, the same pair appears exactly once."""
    from activedata_etl_spark.ext.dedup import lsh_candidate_pairs

    # Hand-crafted minhash signatures (h0..h15, 4 bands x 4 hashes):
    # X and Y agree on ALL bands; fillers agree with them on band 0
    # only, blowing that one bucket past the cap.
    def sig_row(doc_id, tail):
        return (doc_id, *(["S"] * 4), *tail)

    cols = "doc_id long, " + ", ".join(f"h{i} string" for i in range(16))
    x = sig_row(1, ["A"] * 12)
    y = sig_row(2, ["A"] * 12)
    fillers = [sig_row(100 + i, [f"F{100 + i}_{j}" for j in range(12)])
               for i in range(10)]
    sig = spark.createDataFrame([x, y] + fillers, cols)

    capped = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(
        None, "doc_id", None, sig=sig, max_bucket_size=5).collect()}
    assert (1, 2) in capped, "cap dropped a pair that shares an under-cap band"
    assert all(a < 100 for a, _ in capped), f"over-cap bucket leaked: {capped}"

    uncapped = [(r.id_a, r.id_b) for r in lsh_candidate_pairs(
        None, "doc_id", None, sig=sig).collect()]
    assert uncapped.count((1, 2)) == 1, "pair not emitted exactly once"


def test_fanout_hot_bucket_leg_matches_cold_path(spark, tmp_path):
    """r14 bounded fan-out pin (guide §5/§2.5): buckets above
    ``fanout_limit`` leave the collect_list path for the spillable
    self-join leg — the emitted pair set must be IDENTICAL. A tiny
    limit forces every fixture bucket hot, so this exercises the leg
    the registered queries (whose buckets sit far under the default
    256) never reach."""
    from activedata_etl_spark.ext import dedup as DD
    from activedata_etl_spark.ext import similarity as SIM

    # --- cosine: 6 vectors, all-positive first band → one 6-member
    # bucket in band 0; later dims vary so other bands split.
    rows = [(i, [1.0] * 16 + [float((i >> b) & 1) * 2 - 1
                              for b in range(48)]) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cold = sorted((r.id_a, r.id_b, r.cos) for r in SIM.cosine_dedup_pairs(
        df, "vec_id", "embedding", threshold=0.0).collect())
    hot = sorted((r.id_a, r.id_b, r.cos) for r in SIM.cosine_dedup_pairs(
        df, "vec_id", "embedding", threshold=0.0, fanout_limit=2).collect())
    assert cold == hot and len(cold) == 15

    # --- index-served twin over the same corpus
    idx = str(tmp_path / "hot_band_idx")
    SIM.build_band_index(df, "vec_id", "embedding", idx)
    icold = sorted((r.id_a, r.id_b, r.qcos) for r in SIM.pairs_from_band_index(
        spark, idx, threshold=0.0).collect())
    ihot = sorted((r.id_a, r.id_b, r.qcos) for r in SIM.pairs_from_band_index(
        spark, idx, threshold=0.0, fanout_limit=2).collect())
    assert icold == ihot and len(icold) == 15

    # --- minhash LSH: reuse the hand-crafted signature shape from the
    # cap test — X/Y agree on every band, fillers crowd band 0 only.
    def sig_row(doc_id, tail):
        return (doc_id, *(["S"] * 4), *tail)

    cols = "doc_id long, " + ", ".join(f"h{i} string" for i in range(16))
    sig = spark.createDataFrame(
        [sig_row(1, ["A"] * 12), sig_row(2, ["A"] * 12)]
        + [sig_row(100 + i, [f"F{100 + i}_{j}" for j in range(12)])
           for i in range(6)], cols)
    lcold = sorted((r.id_a, r.id_b) for r in DD.lsh_candidate_pairs(
        None, "doc_id", None, sig=sig).collect())
    lhot = sorted((r.id_a, r.id_b) for r in DD.lsh_candidate_pairs(
        None, "doc_id", None, sig=sig, fanout_limit=3).collect())
    assert lcold == lhot and lcold.count((1, 2)) == 1

"""jx front-end reach into the extension operators (VERDICT r4 #9).

The reference's contract is "JSON query in, result out" — but the
LLM-pipeline operators (near-dup pairs, ANN top-k, quality gates) were
Python-API-only. This module exposes the flagship ones as a jx ``from``
clause: a dict with an ``op`` key plans the operator and hands its
output DataFrame to the ordinary clause pipeline, so where/select/sort/
limit/format all compose on top —

    {"from": {"op": "near_dup_pairs", "table": "documents",
              "threshold": 0.2},
     "where": {"gte": {"jaccard": 0.5}}, "sort": "id_a", "limit": 10}

``table`` resolves through the normal from-resolution (a registered
view, a deep path, even a nested query dict), so the ops run on
anything the query layer can already reach. Each op is a thin
parameter-mapping shim over the ext/ implementation — the plan shape,
scale posture, and oracle pairing live there, not here.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

_OPS: dict[str, Any] = {}


def op_names() -> set[str]:
    return set(_OPS)


def _op(name: str):
    def deco(fn):
        _OPS[name] = fn
        return fn

    return deco


def run_op(spark: SparkSession, spec: dict[str, Any]) -> DataFrame:
    """Plan an extension-op ``from`` clause."""
    name = spec.get("op")
    if name not in _OPS:
        raise ValueError(
            f"unknown extension op {name!r}; one of {sorted(_OPS)}")
    if "table" not in spec:
        raise ValueError(f"extension op {name!r} needs a 'table'")
    from .query import _from

    df = _from(spark, spec["table"])
    return _OPS[name](spark, df, spec)


@_op("near_dup_pairs")
def _near_dup_pairs(spark, df, spec) -> DataFrame:
    """MinHash → LSH bands → exact-Jaccard verify (ext/dedup.py:
    near_dup_pairs). Output: (id_a, id_b, jaccard)."""
    from ..ext import dedup as DD

    return DD.near_dup_pairs(
        df,
        id_col=spec.get("id", "doc_id"),
        text_col=spec.get("text", "text"),
        n_hashes=int(spec.get("n_hashes", 16)),
        n_bands=int(spec.get("n_bands", 4)),
        shingle_n=int(spec.get("shingle_n", 3)),
        threshold=float(spec.get("threshold", 0.5)),
        max_bucket_size=spec.get("max_bucket_size"),
    )


@_op("ann_topk")
def _ann_topk(spark, df, spec) -> DataFrame:
    """Cosine top-k per query vector (ext/similarity.py). ``queries`` is
    a jx expression selecting the query rows (default: every row);
    output (q_id, <id>, cos). ``method="brute"`` is the exactness
    baseline; ``"lsh"`` routes through the sign-LSH bucketed variant
    (the scale path: candidates shrink to same-bucket rows)."""
    from pyspark.sql import functions as F

    from ..ext import similarity as SIM
    from .expressions import compile_expr

    id_col = spec.get("id", "vec_id")
    vec_col = spec.get("vector", "embedding")
    k = int(spec.get("k", 5))
    q = df
    if "queries" in spec:
        q = df.filter(compile_expr(spec["queries"]))
    q = q.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    method = spec.get("method", "brute")
    if method == "brute":
        return SIM.cosine_topk(q, df, "q_id", "q_vec", id_col, vec_col, k=k)
    if method == "lsh":
        # n_bits: "auto" scales the sign-LSH width with the corpus
        # (similarity.auto_sign_bits — bucket occupancy stays bounded)
        nb = spec.get("n_bits", 8)
        return SIM.ann_sign_lsh_topk(q, df, "q_id", "q_vec", id_col, vec_col,
                                     k=k,
                                     n_bits=nb if nb == "auto" else int(nb))
    if method == "pq":
        # compressed-domain ADC search (ext/pq.py, r10): the query set
        # re-selects from the corpus by the queries expression — PQ
        # trains on the corpus and answers from codes + a broadcast
        # distance table. dim is explicit (plan-only safe).
        from ..ext import pq as PQ

        qdf = df.filter(compile_expr(spec["queries"])) if "queries" in spec \
            else df
        # balance_dims: the variance-balancing permutation (r11
        # OPQ-lite); rotation: "pca" (trained, ext/pq.pca_rotation) or
        # an explicit dim×dim matrix — the full-OPQ path (r12);
        # train_fraction: deterministic md5-sampled training
        return PQ.pq_topk(df, qdf, id_col, vec_col, k=k,
                          m=int(spec.get("m", 4)),
                          ksub=int(spec.get("ksub", 8)),
                          n_iter=int(spec.get("n_iter", 2)),
                          dim=int(spec.get("dim", 64)),
                          balance_dims=bool(spec.get("balance_dims",
                                                     False)),
                          rotation=spec.get("rotation"))
    if method in ("pq_index", "ivfpq_index"):
        # SERVING path (r11, VERDICT r10 #3): answer from a PERSISTED
        # index — the frozen codebook (+ centroids for ivfpq) and the
        # stored codes; no training, no raw-vector read. ``index``
        # names an ATTACHED index base dir (serve(..., indexes=...) /
        # io.register_index_path) — the jx surface resolves indexes by
        # NAME only, never raw filesystem paths (the
        # prefix_stable_delta convention). ``nprobe`` bounds the probed
        # clusters for ivfpq_index.
        from ..ext import pq as PQ
        from ..io import index_path

        name = spec.get("index")
        base = index_path(name) if isinstance(name, str) else None
        if base is None:
            raise ValueError(
                f"ann_topk method {method!r} needs 'index' naming an "
                "attached PQ index (serve(..., indexes={name: base_dir}) "
                "or io.register_index_path)")
        qdf = df.filter(compile_expr(spec["queries"])) if "queries" in spec \
            else df
        if method == "pq_index":
            return PQ.pq_index_topk(qdf, id_col, vec_col, spark, base, k=k)
        return PQ.ivfpq_index_topk(qdf, id_col, vec_col, spark, base, k=k,
                                   nprobe=int(spec.get("nprobe", 2)))
    raise ValueError(
        f"unknown ann method {method!r}: brute|lsh|pq|pq_index|ivfpq_index")


@_op("quality_gate")
def _quality_gate(spark, df, spec) -> DataFrame:
    """Gopher quality metrics + keep flag per document (ext/text.py:
    gopher_table / gopher_keep — Rae et al. 2021 §A1.1)."""
    from ..ext import text as TX

    id_col = spec.get("id", "doc_id")
    return (TX.gopher_table(df, [id_col], spec.get("text", "text"))
            .withColumn("keep", TX.gopher_keep()))


@_op("semantic_dedup")
def _semantic_dedup(spark, df, spec) -> DataFrame:
    """SemDeDup-style embedding dedup (ext/similarity.semantic_dedup):
    k-means clusters, per-cluster representative, keep flag."""
    from ..ext import similarity as SIM

    # nlist "auto" = √N clusters (the SemDeDup contract; see the
    # semantic_dedup docstring's r11 adjudication — auto's value is the
    # refinement stage, fixed-16 stays the clustering default)
    nl = spec.get("nlist", 16)
    return SIM.semantic_dedup(
        df,
        id_col=spec.get("id", "vec_id"),
        vec_col=spec.get("vector", "embedding"),
        nlist=nl if nl == "auto" else int(nl),
        n_iter=int(spec.get("n_iter", 2)),
        threshold=float(spec.get("threshold", 0.995)),
    )


@_op("split")
def _split(spark, df, spec) -> DataFrame:
    """Deterministic hash split (ext/sampling.split_label): adds a
    ``split`` column from ``weights`` (e.g. {"train": 0.9,
    "eval": 0.1}) keyed on ``id`` + ``salt`` — stable under corpus
    growth and repartitioning."""
    from pyspark.sql import functions as F

    from ..ext import sampling as SA

    weights = spec.get("weights") or {"train": 0.9, "eval": 0.1}
    return df.withColumn("split", SA.split_label(
        F.col(spec.get("id", "doc_id")), dict(weights),
        salt=str(spec.get("salt", ""))))


@_op("chunks")
def _chunks(spark, df, spec) -> DataFrame:
    """Fixed-size token chunking (ext/dedup.chunk_table): one row per
    ``chunk``-token window with its md5 — the segmenter behind C4-style
    dedup, decontamination, and RAG-style corpus chunking."""
    from ..ext import dedup as DD

    return DD.chunk_table(
        df,
        id_col=spec.get("id", "doc_id"),
        text_col=spec.get("text", "text"),
        chunk=int(spec.get("chunk", 10)),
        extra_cols=tuple(spec.get("carry", ())),
    )


@_op("source_overlap")
def _source_overlap(spark, df, spec) -> DataFrame:
    """Directed cross-subcorpus chunk containment
    (ext/dedup.source_overlap_matrix)."""
    from ..ext import dedup as DD

    return DD.source_overlap_matrix(
        df,
        id_col=spec.get("id", "doc_id"),
        text_col=spec.get("text", "text"),
        group_col=spec.get("group", "source"),
        chunk=int(spec.get("chunk", 10)),
    )


@_op("cdc_chunks")
def _cdc_chunks(spark, df, spec) -> DataFrame:
    """Content-defined chunking (ext/dedup.cdc_chunk_table): boundaries
    from the rolling window hash — the edit-robust chunker."""
    from ..ext import dedup as DD

    return DD.cdc_chunk_table(
        df,
        id_col=spec.get("id", "doc_id"),
        text_col=spec.get("text", "text"),
        window=int(spec.get("window", 4)),
        mask=int(spec.get("mask", 15)),
        extra_cols=tuple(spec.get("carry", ())),
    )


@_op("exact_substrings")
def _exact_substrings(spark, df, spec) -> DataFrame:
    """ExactSubstr-style repeated-substring spans
    (ext/dedup.exact_substring_spans, Lee et al. 2022)."""
    from ..ext import dedup as DD

    return DD.exact_substring_spans(
        df,
        id_col=spec.get("id", "doc_id"),
        text_col=spec.get("text", "text"),
        k=int(spec.get("k", 10)),
    )


@_op("exact_substr_removal")
def _exact_substr_removal(spark, df, spec) -> DataFrame:
    """Cut duplicated runs, keep the canonical occurrence
    (ext/dedup.exact_substring_removal)."""
    from ..ext import dedup as DD

    return DD.exact_substring_removal(
        df,
        id_col=spec.get("id", "doc_id"),
        text_col=spec.get("text", "text"),
        k=int(spec.get("k", 10)),
    )


@_op("skew_profile")
def _skew_profile(spark, df, spec) -> DataFrame:
    """Join-key skew diagnostics (operators/skew.key_skew_profile):
    NDV + top-1/top-10 key shares for ``columns``."""
    from ..operators.skew import key_skew_profile

    cols = spec.get("columns")
    if not cols:
        raise ValueError("skew_profile needs 'columns': [...]")
    return key_skew_profile(df, list(cols))


@_op("bm25")
def _bm25(spark, df, spec) -> DataFrame:
    """BM25 lexical retrieval (ext/text.bm25_topk): ``terms`` is the
    query; output (<id>, bm25), top-``k`` by score."""
    from ..ext import text as TX

    terms = spec.get("terms")
    if not terms or not isinstance(terms, list):
        raise ValueError("bm25 needs 'terms': [\"...\", ...]")
    return TX.bm25_topk(
        df,
        id_col=spec.get("id", "doc_id"),
        text_col=spec.get("text", "text"),
        terms=[str(t) for t in terms],
        k=int(spec.get("k", 15)),
    )


@_op("knn_graph")
def _knn_graph(spark, df, spec) -> DataFrame:
    """Cluster-confined kNN graph (ext/similarity.knn_graph): output
    (src, dst, cos), top-``k`` cosine neighbors within each vector's
    IVF cluster."""
    from ..ext import similarity as SIM

    return SIM.knn_graph(
        df,
        id_col=spec.get("id", "vec_id"),
        vec_col=spec.get("vector", "embedding"),
        k=int(spec.get("k", 3)),
        nlist=int(spec.get("nlist", 8)),
        n_iter=int(spec.get("n_iter", 2)),
    )


@_op("priority_sample")
def _priority_sample(spark, df, spec) -> DataFrame:
    """Weighted sampling without replacement (ext/sampling.
    priority_sample): ``weight`` column, ``k`` rows; output
    (<id>, <weight>, priority, est_weight)."""
    from ..ext import sampling as SA

    if "weight" not in spec:
        raise ValueError("priority_sample needs 'weight': \"<column>\"")
    return SA.priority_sample(
        df,
        id_col=spec.get("id", "doc_id"),
        weight_col=str(spec["weight"]),
        k=int(spec.get("k", 10)),
        salt=str(spec.get("salt", "")),
    )


@_op("temperature_mixture")
def _temperature_mixture(spark, df, spec) -> DataFrame:
    """Temperature (size^0.5) mixture plan + realized keep
    (ext/sampling.temperature_mixture). Needs ``source``, ``size``,
    ``budget``."""
    from ..ext import sampling as SA

    for req in ("source", "size", "budget"):
        if req not in spec:
            raise ValueError(f"temperature_mixture needs {req!r}")
    return SA.temperature_mixture(
        df,
        source_col=str(spec["source"]),
        id_col=spec.get("id", "doc_id"),
        size_col=str(spec["size"]),
        budget=int(spec["budget"]),
        salt=str(spec.get("salt", "")),
    )


@_op("winnowing_pairs")
def _winnowing_pairs(spark, df, spec) -> DataFrame:
    """MOSS winnowing match candidates (ext/dedup.winnowing_pairs):
    k-gram size ``k``, window ``w``, ``min_shared`` fingerprints,
    ``max_df`` hot-hash cap. Output (id_a, id_b, shared)."""
    from ..ext import dedup as DD

    return DD.winnowing_pairs(
        df,
        id_col=spec.get("id", "doc_id"),
        text_col=spec.get("text", "text"),
        k=int(spec.get("k", 4)),
        w=int(spec.get("w", 4)),
        min_shared=int(spec.get("min_shared", 2)),
        max_df=spec.get("max_df", 50),
    )


@_op("asof")
def _asof(spark, df, spec) -> DataFrame:
    """As-of join as a jx from clause: left = ``table``, right =
    ``right`` (BOTH resolve through the normal from-resolution, so
    either side can be a view, a deep path, or a nested query dict).
    ``direction``: backward (default) | forward | nearest; backward/
    forward accept ``tolerance_s`` and ``split_hot_keys``; nearest is
    the closest-either-way variant (operators/joins.asof_join_nearest).
    Output: left columns + ``right_cols`` (default: right-only cols)."""
    from ..operators import joins as J
    from .query import _from

    for req in ("right", "left_on", "right_on",
                "left_time", "right_time", "tiebreak"):
        if req not in spec:
            raise ValueError(f"asof needs {req!r} (from.{req})")
    right = _from(spark, spec["right"])
    kw = dict(left_on=str(spec["left_on"]), right_on=str(spec["right_on"]),
              left_time=str(spec["left_time"]),
              right_time=str(spec["right_time"]),
              tiebreak=str(spec["tiebreak"]),
              right_cols=spec.get("right_cols"))
    direction = str(spec.get("direction", "backward"))
    if direction == "nearest":
        if "tolerance_s" in spec or "split_hot_keys" in spec:
            raise ValueError(
                "asof direction 'nearest' takes no tolerance_s/"
                "split_hot_keys")
        return J.asof_join_nearest(df, right, **kw)
    tol = spec.get("tolerance_s")
    return J.asof_join(df, right, **kw,
                       tolerance_s=float(tol) if tol is not None else None,
                       direction=direction,
                       split_hot_keys=spec.get("split_hot_keys"))


@_op("top_component")
def _top_component(spark, df, spec) -> DataFrame:
    """Dominant principal direction by deterministic power iteration
    (ext/similarity.top_component), emitted long-form (pos, v, lam) so
    jx clauses compose on rows."""
    from pyspark.sql import functions as F

    from ..ext.similarity import top_component

    comp = top_component(df, spec.get("id", "vec_id"),
                         spec.get("vector", "embedding"),
                         n_iter=int(spec.get("n_iter", 3)))
    return (comp.select(F.posexplode("vt").alias("pos", "v"), "lam")
            .withColumn("pos", F.col("pos").cast("long")))


@_op("bottomk_jaccard")
def _bottomk_jaccard(spark, df, spec) -> DataFrame:
    """Pairwise Jaccard between every two groups' key sets, estimated
    from their bottom-k signatures alone (functions/bottomk.py) —
    k·groups² signature rows, never a data rescan. Output:
    (<group>, <group>_b, n_union_sample, n_shared, j_est)."""
    from ..functions import bottomk as BK

    group = spec.get("group")
    value = spec.get("value")
    if not group or not value:
        raise ValueError("bottomk_jaccard needs 'group' and 'value'")
    k = int(spec.get("k", 16))
    sig = BK.bottomk_signature(df, [group], value, k=k)
    return BK.bottomk_jaccard(sig, group, k=k)


@_op("bottomk_setops")
def _bottomk_setops(spark, df, spec) -> DataFrame:
    """Union / intersection cardinalities for every two groups' key
    sets, estimated from their bottom-k signatures alone
    (functions/bottomk.bottomk_setops) — the Theta-sketch question at
    KMV cost. Output: (<group>, <group>_b, n_union_sample, n_shared,
    union_est, j_est, intersect_est)."""
    from ..functions import bottomk as BK

    group = spec.get("group")
    value = spec.get("value")
    if not group or not value:
        raise ValueError("bottomk_setops needs 'group' and 'value'")
    k = int(spec.get("k", 64))
    sig = BK.bottomk_signature(df, [group], value, k=k)
    return BK.bottomk_setops(sig, group, k=k)


@_op("quantile_bounds")
def _quantile_bounds(spark, df, spec) -> DataFrame:
    """Per-group quantile BOUNDS from log-histogram registers
    (functions/qhist.py): ``ps`` maps name → [numerator, denominator]
    rationals, e.g. {"p50": [1, 2], "p95": [19, 20]}. Output columns:
    (<group>..., n_rows, <name>_bucket, <name>_lo, <name>_hi)."""
    from ..functions import qhist as QH

    group = spec.get("group")
    value = spec.get("value")
    if not group or not value:
        raise ValueError("quantile_bounds needs 'group' and 'value'")
    ps_in = spec.get("ps", {"p50": [1, 2]})
    ps = {str(name): (int(nd[0]), int(nd[1])) for name, nd in ps_in.items()}
    regs = QH.qhist_registers(df, [group], value)
    return QH.qhist_quantile_bounds(regs, [group], ps)


@_op("prefix_filter_pairs")
def _prefix_filter_pairs(spark, df, spec) -> DataFrame:
    """EXACT set-similarity join (AllPairs/PPJoin prefix filtering,
    ext/dedup.py: prefix_filter_pairs) — recall 1.0 at the threshold,
    no band/bucket recall knob. ``shingle_n: null`` switches the set
    elements from word n-grams to raw tokens; ``pair_bound:
    "aggregate"`` swaps the per-row positional filter for the
    PPJoin+-flavored aggregate bound (both exact — the blocking audit
    measures which prunes more on a given corpus). Output:
    (id_a, id_b, jaccard)."""
    from ..ext import dedup as DD

    sn = spec.get("shingle_n", 3)
    return DD.prefix_filter_pairs(
        df,
        id_col=spec.get("id", "doc_id"),
        text_col=spec.get("text", "text"),
        threshold=float(spec.get("threshold", 0.5)),
        shingle_n=int(sn) if sn is not None else None,
        pair_bound=str(spec.get("pair_bound", "positional")),
    )


@_op("trimmed_means")
def _trimmed_means(spark, df, spec) -> DataFrame:
    """Exact trimmed + winsorized means per group over the value
    histogram (functions/aggs.py: trimmed_means_histogram). Output:
    (<group>..., n, k, mean, trimmed_mean, winsorized_mean)."""
    from ..functions import aggs as AGG

    group = spec.get("group")
    value = spec.get("value")
    if not group or not value:
        raise ValueError("trimmed_means needs 'group' and 'value'")
    keys = group if isinstance(group, list) else [group]
    return AGG.trimmed_means_histogram(
        df, keys, value, trim=float(spec.get("trim", 0.1)))


@_op("prefix_filter_join")
def _prefix_filter_join(spark, df, spec) -> DataFrame:
    """Cross-table EXACT set-similarity join (the decontamination
    shape, ext/dedup.py: prefix_filter_join): left = ``table``, right =
    ``right`` (both resolve through the normal from-resolution). Ids
    must be globally unique across the two inputs. Output:
    (left_id, right_id, jaccard)."""
    from ..ext import dedup as DD
    from .query import _from

    if "right" not in spec:
        raise ValueError("prefix_filter_join needs a 'right' table")
    right = _from(spark, spec["right"])
    sn = spec.get("shingle_n", 3)
    return DD.prefix_filter_join(
        df, right,
        id_col=spec.get("id", "doc_id"),
        text_col=spec.get("text", "text"),
        threshold=float(spec.get("threshold", 0.5)),
        shingle_n=int(sn) if sn is not None else None,
    )


@_op("prefix_stable_delta")
def _prefix_stable_delta(spark, df, spec) -> DataFrame:
    """Nightly delta query against a persisted STABLE-ORDER prefix index
    (ext/dedup.prefix_join_stable_delta): the element order was FROZEN
    at index build, stored batches are positioned on parquet, and only
    the delta (``table``) is tokenized — exact Jaccard >= threshold
    pairs touching a delta row, recall 1.0 under a stale order by the
    prefix lemma. ``index`` names an ATTACHED index base directory
    (service.attach_indexes / io.register_index_path) containing the
    ``idx`` (positioned rows) and ``order`` (frozen element order)
    subdirectories — the jx surface resolves indexes by NAME only,
    never raw filesystem paths. Output: (id_a, id_b, jaccard)."""
    import os

    from ..ext import dedup as DD
    from ..io import index_path

    name = spec.get("index")
    base = index_path(name) if isinstance(name, str) else None
    if base is None:
        raise ValueError(
            "prefix_stable_delta needs 'index' naming an attached "
            "stable-order index (serve(..., indexes={name: base_dir}) "
            "or io.register_index_path)")
    return DD.prefix_join_stable_delta(
        spark, os.path.join(base, "idx"), os.path.join(base, "order"),
        df,
        spec.get("id", "doc_id"), spec.get("text", "text"),
        threshold=float(spec.get("threshold", 0.5)),
        pair_bound=str(spec.get("pair_bound", "aggregate")),
        # None → the engine's r13 auto-resolution (positional when the
        # index can serve it, counts for pre-r12 indexes)
        verify=str(spec["verify"]) if "verify" in spec else None)


@_op("resample")
def _resample(spark, df, spec) -> DataFrame:
    """Time-series resample + gap fill as a jx from clause
    (operators/timeseries.py): snap observations to a ``step_sec`` grid
    per key over each key's own span, empty buckets filled per
    ``fill``: "none" | "locf" | "linear" | "both" (default). Output:
    keys + (t, v[, v_locf][, v_lerp]); ``max_buckets`` guards a
    span/step blowup (plan-only probes skip the guard's job, same as
    every construction-time probe behind format=explain)."""
    from ..operators import timeseries as TS

    for req in ("ts", "value", "keys", "step_sec"):
        if req not in spec:
            raise ValueError(f"resample needs {req!r} (from.{req})")
    fill = str(spec.get("fill", "both"))
    if fill not in ("none", "locf", "linear", "both"):
        raise ValueError(
            f"resample fill must be none|locf|linear|both, got {fill!r}")
    keys = spec["keys"]
    keys = [keys] if isinstance(keys, str) else [str(k) for k in keys]
    grid = TS.resample(
        df, str(spec["ts"]), str(spec["value"]), keys,
        int(spec["step_sec"]),
        max_buckets=int(spec.get("max_buckets", TS.MAX_BUCKETS_DEFAULT)))
    cols = [*keys, "t", "v"]
    out = grid
    if fill in ("locf", "both"):
        out = out.withColumn("v_locf", TS.fill_locf(keys))
        cols.append("v_locf")
    if fill in ("linear", "both"):
        out = out.withColumn("v_lerp", TS.fill_linear(keys))
        cols.append("v_lerp")
    return out.select(*cols)


@_op("leakage_safe_split")
def _leakage_safe_split(spark, df, spec) -> DataFrame:
    """Leakage-safe train/val/test split as a jx from clause
    (queries/q_sampling.sample_leakage_safe_split made declarative,
    VERDICT r9 #8): near-dup clusters (verified LSH pairs → min-id
    components) share one split label, so near-copies never straddle
    train/test. Spec: {"op": "leakage_safe_split", "table": ...,
    "id": "doc_id", "text": "text", "threshold": 0.2,
    "fractions": {"train": 0.8, "val": 0.1, "test": 0.1},
    "salt": "leak1"}. Output: (id column, cluster_id, split)."""
    from pyspark.sql import functions as F

    from ..ext import dedup as DD
    from ..ext import sampling as S

    for req in ("id", "text"):
        if req not in spec:
            raise ValueError(f"leakage_safe_split needs {req!r}")
    id_c, text_c = str(spec["id"]), str(spec["text"])
    fractions = {str(k): float(v) for k, v in
                 spec.get("fractions",
                          {"train": 0.8, "val": 0.1, "test": 0.1}).items()}
    pairs = DD.near_dup_pairs(df, id_c, text_c,
                              threshold=float(spec.get("threshold", 0.2)))
    comp = (DD.connected_components(pairs)
            .select(F.col("id").alias(id_c), "cluster_id"))
    lab = (df.select(id_c).join(comp, id_c, "left")
           .withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_c))))
    return lab.withColumn("split", S.split_label(
        F.col("cluster_id"), fractions, salt=str(spec.get("salt", ""))))


@_op("importance_scores")
def _importance_scores(spark, df, spec) -> DataFrame:
    """DSIR-style data selection as a jx from clause
    (ext/sampling.importance_scores): score every ``table`` doc's
    hashed n-gram features toward a trusted ``target`` corpus (BOTH
    resolve through the normal from-resolution — view, deep path, or
    nested query dict, so the target slice can be declared inline:
    {"from": "documents", "where": {...}}). Output: (id, n_feats,
    score), score > 0.5 = more target-like than raw-like."""
    from ..ext import sampling as S
    from .query import _from

    for req in ("target", "id", "text"):
        if req not in spec:
            raise ValueError(f"importance_scores needs {req!r} (from.{req})")
    target = _from(spark, spec["target"])
    return S.importance_scores(
        df, target, str(spec["id"]), str(spec["text"]),
        n=int(spec.get("n", 2)), buckets=int(spec.get("buckets", 4096)))

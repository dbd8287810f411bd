"""Physical-plan regression tests: the scale-critical plan properties
must survive refactors (SCALE.md's claims, mechanically enforced)."""

import pytest

from activedata_etl_spark.queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: orderkey/suppkey/partkey are not in the read schema
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_broadcast_joins_where_intended(spark, sf_dir):
    for name in ["join_inner_broadcast", "tpch_q5_local_supplier_volume",
                 "edges_time_months"]:
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, f"{name}: dim join degraded to SMJ"


def test_tpch_q5_single_fact_shuffle(spark, sf_dir):
    """5-way star: every dim broadcast ⇒ at most the lineitem⨝orders join
    and the final aggregate shuffle."""
    plan = _plan(spark, sf_dir, "tpch_q5_local_supplier_volume")
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 2, f"{n_shuffles} shuffles:\n{plan[:1500]}"


def test_topk_plans_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sort_multi_key_topk")
    assert "TakeOrderedAndProject" in plan  # top-k, not a full sort


def test_q2_decorrelated_to_single_window(spark, sf_dir):
    """Correlated MIN must decorrelate to ONE window over the candidate
    set, not an aggregate + re-join double scan; dims all broadcast."""
    plan = _plan(spark, sf_dir, "tpch_q2_min_cost_supplier")
    assert plan.count("Window") == 1
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_q9_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q9_product_type_profit")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_anti_joins_stay_broadcast(spark, sf_dir):
    """NOT IN / NOT EXISTS exclusion lists are small → broadcast anti,
    never a shuffled join of the whole fact against the exclusion."""
    for name in ["tpch_q16_supplier_relationship",
                 "tpch_q22_global_sales_opportunity"]:
        plan = _plan(spark, sf_dir, name)
        assert "LeftAnti, BuildRight" in plan, name


def test_q21_single_fact_join_strategy(spark, sf_dir):
    """EXISTS+NOT EXISTS decorrelated into one per-order aggregate: the
    plan must contain exactly one shuffled fact-fact join (li⨝per_order),
    with supplier/nation broadcast."""
    plan = _plan(spark, sf_dir, "tpch_q21_suppliers_kept_waiting")
    assert plan.count("SortMergeJoin") <= 1
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_percentile_window_reuses_partitioning(spark, sf_dir):
    """sorted_percentiles: the groupBy after the window must NOT add an
    Exchange — the window already hash-partitioned on the group key."""
    from pyspark.sql import functions as F

    from activedata_etl_spark.functions.aggs import sorted_percentiles
    from activedata_etl_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    df = sorted_percentiles(li, ["l_returnflag"], "l_extendedprice",
                            {"med": 0.5})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1200]


def test_no_cartesian_in_lsh(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_lsh_jaccard_pairs")
    assert "CartesianProduct" not in plan
    plan2 = _plan(spark, sf_dir, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan2  # candidates come from buckets


def test_hash_sample_is_scan_local(spark, sf_dir):
    """Deterministic sampling must stay a pure filter: no shuffle, no
    window, and the md5 predicate inside whole-stage codegen."""
    plan = _plan(spark, sf_dir, "sample_hash_fraction")
    assert "Exchange" not in plan
    assert "*(1) Filter" in plan  # '*' = inside whole-stage codegen


def test_stratified_take_single_shuffle(spark, sf_dir):
    """Per-stratum exact-N: exactly the one shuffle the window needs."""
    plan = _plan(spark, sf_dir, "sample_stratified_take")
    assert plan.count("Exchange hashpartitioning") == 1


def test_duration_domain_broadcast_completion(spark, sf_dir):
    """Dense duration bins join via broadcast — domain completion must
    never shuffle the aggregate."""
    plan = _plan(spark, sf_dir, "edges_duration_latency")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q18_single_lineitem_pass(spark, sf_dir):
    """q18's HAVING aggregate is reused as sum_qty: lineitem must be
    scanned once, aggregated once, and both attach-joins broadcast."""
    plan = _plan(spark, sf_dir, "tpch_q18_large_volume_customer")
    assert plan.count("lineitem.parquet") == 1, "lineitem re-scanned"
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_global_shuffle_single_exchange(spark, sf_dir):
    """global_shuffle = one hash exchange on the shard key + shard-local
    sort; no global sort (Exchange rangepartitioning) may appear."""
    plan = _plan(spark, sf_dir, "corpus_global_shuffle")
    assert "Exchange rangepartitioning" not in plan, "global sort crept in"
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_overlap_is_equi_join(spark, sf_dir):
    """Binned interval-overlap join must plan as a hash/merge equi-join
    on the bin id — never the O(|L|x|R|) broadcast nested loop the naive
    inequality form degenerates to."""
    plan = _plan(spark, sf_dir, "join_interval_overlap")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) \
        or ("BroadcastHashJoin" in plan)
    # r5: the first-shared-bin guard replaced the pair-dedup distinct —
    # NO aggregate may sit above the join (the only HashAggregates are
    # the sessionize rollups BELOW it)
    above_join = plan.split("Join", 1)[0]
    assert "HashAggregate" not in above_join, above_join


def test_sessionize_capped_single_window_exchange(spark, sf_dir):
    """All of sessionize_capped's derived columns share one (keys, order)
    window partitioning: exactly the window exchange + the final
    aggregate exchange — a per-session re-shuffle would make it three."""
    plan = _plan(spark, sf_dir, "events_sessionize_capped")
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:1200]


def test_bloom_prefilter_sits_below_join(spark, sf_dir):
    """The semi-join reduction must cut the probe BEFORE join machinery:
    the bloom membership test compiles to a Filter over the lineitem
    scan side (below any join), and the bloom build side broadcasts."""
    plan = _plan(spark, sf_dir, "join_bloom_prefiltered")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the probe filter references the bloom map lookup on the scan branch
    filt = plan.find("element_at")
    scan = plan.find("FileScan parquet", filt)
    assert filt != -1 and scan != -1, "bloom bit-test filter not in plan"


def test_chunk_dedup_never_shuffles_bodies(spark, sf_dir):
    """Chunk dedup's exchanges must carry hashes, never document text."""
    plan = _plan(spark, sf_dir, "dedup_chunk_level")
    for seg in plan.split("Exchange ")[1:]:
        # inspect the exchange's immediate output row: first line
        assert "text#" not in seg.split("\n")[0], "document bodies in shuffle"


def test_semantic_dedup_broadcasts_centroids(spark, sf_dir):
    """Assignment must be map-side: centroids and reps broadcast; the
    vector table is never the build side of a shuffle join."""
    plan = _plan(spark, sf_dir, "dedup_semantic_clusters")
    assert plan.count("BroadcastExchange") >= 2  # centroids + reps
    assert "SortMergeJoin" not in plan


def test_snapshot_diff_shuffles_hashes_only(spark, sf_dir):
    plan = _plan(spark, sf_dir, "etl_snapshot_diff")
    for seg in plan.split("Exchange ")[1:]:
        head = seg.split("\n")[0]
        assert "o_comment" not in head and "o_orderdate" not in head


def test_no_row_python_udfs_or_stray_cartesians_anywhere(spark, sf_dir):
    """Corpus-wide plan audit: row-at-a-time Python UDFs are banned
    everywhere (Arrow/mapInPandas only), and cartesian products may
    appear only where the design calls for a tiny cross product."""
    cartesian_ok = {
        "jx_edges_two_dim_dense",   # dense 2-D domain completion (tiny)
        "sim_cosine_topk",          # documented brute-force baseline
        "dedup_minhash_estimate",   # shares the brute verify path
    }
    offenders = []
    for name, fn in QUERIES.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            offenders.append(f"{name}: row-python UDF")
        if "CartesianProduct" in plan and name not in cartesian_ok:
            offenders.append(f"{name}: unexpected CartesianProduct")
    assert not offenders, offenders


def test_lm_score_model_tables_broadcast(spark, sf_dir):
    """The bigram/unigram model tables must join map-side onto the
    exploded corpus bigrams (they are reference-slice-sized); the only
    wide shuffles are the model-count groupBys and the final doc agg."""
    plan = _plan(spark, sf_dir, "text_lm_quality_score")
    assert plan.count("BroadcastExchange") >= 2  # bg + uni (+ vocab)
    assert "CartesianProduct" not in plan


def test_sparse_cosine_shuffles_terms_not_text(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_sparse_cosine_pairs")
    assert "CartesianProduct" not in plan
    for seg in plan.split("Exchange ")[1:]:
        assert "text#" not in seg.split("\n")[0], "document bodies in shuffle"


def test_pagerank_rank_vector_joins_are_planned(spark, sf_dir):
    """No cartesian anywhere in the iteration chain; the node-count
    scalar rides a broadcast, never a shuffle."""
    plan = _plan(spark, sf_dir, "graph_pagerank_cooccurrence")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_manifest_pruned_read_pushes_exact_predicate(spark, sf_dir):
    """The manifest-pruned standard read is file-list pruning PLUS a
    normal pushed filter: the exact range predicate must still reach the
    parquet scan of the pruned file subset (pruning is one-sided; the
    scan-level filter is what preserves equivalence)."""
    plan = _plan(spark, sf_dir, "etl_manifest_pruned_read")
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(o_custkey,100" in plan
    assert "LessThanOrEqual(o_custkey,500" in plan


def test_asof_hotkey_split_no_second_data_window(spark, sf_dir):
    """The boundary stitch must stay cheap: ONE window over the data
    (the carry-forward), the stitch built from a partial-aggregated
    groupBy over right rows — not a second whole-frame window over the
    union (the first cut did exactly that and was 10x slower than the
    unsplit join at the SCALE.md rig scale)."""
    plan = _plan(spark, sf_dir, "join_asof_hotkey_split")
    # Window operators in the physical plan: the data carry + the tiny
    # (key, range)-universe carry; a data-sized whole-frame stitch would
    # add a third
    assert plan.count("Window") <= 2, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_broadcasts_stats_and_takes_ordered(spark, sf_dir):
    """BM25's df table and (N, total) row must broadcast (never a
    doc-keyed shuffle of the corpus for corpus constants), and the
    top-k must lower to TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, sf_dir, "text_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastExchange") >= 2


def test_priority_sample_take_ordered_no_global_window(spark, sf_dir):
    """The global top-(k+1) must be TakeOrderedAndProject (per-partition
    heaps), NOT the oracle's single-reducer ROW_NUMBER window."""
    plan = _plan(spark, sf_dir, "sample_priority_weighted")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_knn_graph_equijoin_on_cluster(spark, sf_dir):
    """The kNN self-join must be an equi-join on cid — never a
    cartesian over the corpus. (BroadcastNestedLoopJoin Cross appears by
    design: the tiny centroid table broadcast against the corpus for
    map-side assignment — same pattern as semantic_dedup.)"""
    plan = _plan(spark, sf_dir, "sim_knn_graph")
    assert "CartesianProduct" not in plan
    assert "Join [cid" in plan and "Inner" in plan


def test_ahash_pairs_banded_equijoin(spark, sf_dir):
    """The aHash pair search must be a banded equi-join — no cartesian,
    no BNLJ — and the hash computation must push no shuffle before the
    band explode."""
    plan = _plan(spark, sf_dir, "multimodal_ahash_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_index_pushes_term_filter_to_scan(spark, sf_dir):
    """Index-served BM25 must push the query's term filter into the
    postings parquet scan (at 100 TB with term-bucketed storage this is
    the index seek) — PushedFilters must carry the In(term, ...)."""
    plan = _plan(spark, sf_dir, "text_bm25_from_index")
    import re

    scans = [s for s in plan.split("FileScan") if "term" in s[:2000]]
    assert any(re.search(r"PushedFilters: \[.*In\(term", s) for s in scans), \
        "term In-filter not pushed to postings scan"


def test_term_drift_single_count_shuffle(spark, sf_dir):
    """TV drift: one token-count shuffle + the broadcast totals — no
    second corpus-wide exchange."""
    plan = _plan(spark, sf_dir, "text_term_drift_tv")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan


def test_next_event_examples_single_window_exchange(spark, sf_dir):
    """Example generation must reuse ONE user_id window partitioning
    for context, length, and label — not an exchange per derived col."""
    plan = _plan(spark, sf_dir, "events_next_event_examples")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1


def test_temperature_mixture_broadcasts_plan_rows(spark, sf_dir):
    """The per-source plan (source-cardinality rows) must broadcast back
    onto the corpus — never a shuffled join of the corpus against it."""
    plan = _plan(spark, sf_dir, "sample_temperature_mixture")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hits_no_cartesian_edge_iterations(spark, sf_dir):
    """Every HITS half-step must be an equi-join of the edge list
    against a score vector — no cartesian anywhere in the unrolled
    iterations."""
    plan = _plan(spark, sf_dir, "graph_hits_bipartite")
    assert "CartesianProduct" not in plan


def test_quantile_norm_integer_keyed_lookups(spark, sf_dir):
    """The global order-statistic lookups must be HASH equi-joins on the
    computed integer rank keys (lo_i/hi_i) — not a percentile map or a
    range join.  (One BroadcastNestedLoopJoin IS expected: the 1-row
    global-count scalar attach; what must not appear is a cartesian or
    a data-sized nested loop — pinned by requiring exactly one BNLJ and
    both lookups as BroadcastHashJoin.)"""
    plan = _plan(spark, sf_dir, "text_quality_quantile_norm")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1  # 1-row scalar attach
    assert plan.count("BroadcastHashJoin") >= 2  # the lo_i / hi_i lookups


def test_top_component_no_cartesian_no_vector_shuffle(spark, sf_dir):
    """Power iteration must broadcast the dim-sized direction against the
    corpus each round — never a cartesian; the only Exchanges are the
    dim-rows (pos) aggregations and singleton reassemblies."""
    plan = _plan(spark, sf_dir, "sim_top_component")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row direction attach


def test_dup_ngram_report_heap_topk(spark, sf_dir):
    """Global top-20 must be a TakeOrderedAndProject heap — a full sort
    of the n-gram universe would be a 100 TB global sort."""
    plan = _plan(spark, sf_dir, "text_dup_ngram_report")
    assert "TakeOrderedAndProject" in plan


def test_dedup_pareto_heap_then_tiny_window(spark, sf_dir):
    """The dup-group ranking must heap-select 50 rows BEFORE the
    cumulative window — the single-partition window is then 50 rows,
    never the group universe."""
    plan = _plan(spark, sf_dir, "corpus_dedup_pareto")
    assert "TakeOrderedAndProject" in plan


def test_asof_nearest_single_shuffle_two_windows(spark, sf_dir):
    """Nearest as-of must reuse ONE key exchange for both carry windows
    (ascending + descending scans) — no candidate join, no second
    shuffle."""
    plan = _plan(spark, sf_dir, "join_asof_nearest")
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]
    assert plan.count("Window") == 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_delta_queries_partition_prune_batch_dirs(spark, sf_dir):
    """The delta-restricted index queries must read ONLY the delta's
    batch directory on their scored path — PartitionFilters on `batch`
    reach the register/postings scan, so the nightly cost is
    delta-shard-sized, never index-sized."""
    plan = _plan(spark, sf_dir, "text_bm25_delta_topk")
    # one scan carries the batch predicate (the scored tf leg)
    assert "PartitionFilters" in plan and "batch" in plan
    assert "(batch" in plan.split("PartitionFilters", 1)[1][:200] \
        or "batch =" in plan or "batch#" in plan
    plan = _plan(spark, sf_dir, "agg_cms_delta_heavy_hitters")
    # the register read names only the batch=1 directory: a one-shard
    # scan (path-pruned before planning, stronger than a runtime filter)
    assert "batch=1" in plan


def test_bottomk_global_takes_ordered(spark, sf_dir):
    """The GLOBAL bottom-k signature must lower to
    TakeOrderedAndProject (per-partition heaps), never a
    single-partition sort of the distinct-key universe."""
    from activedata_etl_spark.functions import bottomk as BK
    from activedata_etl_spark.io import load_table

    e = load_table(spark, sf_dir, "events")
    plan = BK.bottomk_signature(e, [], "user_id", k=16) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_qhist_registers_partial_aggregate(spark, sf_dir):
    """Register construction must partial-aggregate map-side (≤64
    bucket rows per group per partition cross the shuffle, not data
    rows): two HashAggregates around one Exchange, no window, no sort
    of the data."""
    plan = _plan(spark, sf_dir, "agg_qhist_registers")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan and "Sort" not in plan.split("ReadSchema")[0]


def test_chunk_delta_semijoin_before_dupcount(spark, sf_dir):
    """chunk_delta_stats must semi-join the corpus index on the DELTA's
    hash set before the dup-count aggregation — the aggregated row set
    is (delta hashes × their occurrences), not index-sized."""
    plan = _plan(spark, sf_dir, "dedup_chunk_delta_stats")
    assert "LeftSemi" in plan


# ---------------------------------------------------------------------------
# r10 (VERDICT r9 #6): operator-count guards for the most expensive
# HEADLINE queries — the invariants the round notes quote, mechanically
# pinned so a refactor that silently adds a shuffle/Window/Generate
# fails CI instead of surfacing as a bench-drift question. Bounds are
# ≤ the audited plan's counts at the smallest sf; equality is asserted
# only where the invariant IS the count (e.g. resample's single Window).


def test_gopher_rules_scan_local(spark, sf_dir):
    """text_gopher_rules is one pass over the scan: per-doc column
    math only — no window, generate, or join of any kind may ever
    appear (at 100 TB this query's cost must be the read). r13: the
    ONE permitted exchange is parallelize_narrow_scan's round-robin
    widening of a sub-split-size local fixture (REPARTITION_BY_NUM);
    it triggers only when splits < cores, so at scale the plan is
    exchange-free and the cost is still the read. Any OTHER exchange
    (hash/range — i.e. a real shuffle keyed on data) stays banned."""
    plan = _plan(spark, sf_dir, "text_gopher_rules")
    for op in ("Window", "Generate", "Join", "CartesianProduct"):
        assert op not in plan, f"{op} crept into a scan-local plan"
    exchanges = [ln for ln in plan.splitlines()
                 if "Arguments:" in ln and "Partitioning" in ln]
    assert all("RoundRobinPartitioning" in ln for ln in exchanges), (
        f"non-widening exchange crept into a scan-local plan: {exchanges}")


def test_typed_encoding_compiled_scan_local(spark, sf_dir):
    """typed_encoding_compiled is the UDF-free compiled form: pure
    column expressions over the scan — no exchange, no Python eval."""
    plan = _plan(spark, sf_dir, "typed_encoding_compiled")
    for op in ("Exchange", "BatchEvalPython", "ArrowEvalPython", "Join"):
        assert op not in plan, f"{op} crept into the compiled form"


def test_embedding_cosine_bulk_banded_equijoins(spark, sf_dir):
    """dedup_embedding_cosine_bulk (the most expensive headline query)
    is the bulk banded-join form: band equi-joins + broadcast only —
    never a cartesian/nested-loop pairing of the vector table, and the
    shuffle count stays at the audited bound. Cache cleared first:
    leftover persisted inputs from other tests change size estimates
    and join strategy, and this guard pins the CANONICAL cold plan.

    r14: the bounded fan-out raises the PRINTED exchange count — the
    persisted canon subtree (1 exchange) is re-printed per reference
    (hot-set count, cold anti leg, hot semi legs) and the keys-only
    hot-set count adds one real narrow exchange; the MEMBER payload
    still crosses exactly one exchange (OPTIMIZATION_r14.md)."""
    spark.catalog.clearCache()
    plan = _plan(spark, sf_dir, "dedup_embedding_cosine_bulk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 11, plan[:1500]


def test_nested_explode_roundtrip_single_shuffle(spark, sf_dir):
    """nested_explode_roundtrip: one Generate (the explode) and ONE
    exchange (the collect_list regroup) — the irreducible minimum for
    an explode→regroup roundtrip."""
    plan = _plan(spark, sf_dir, "nested_explode_roundtrip")
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]
    assert plan.count("Generate") == 1


def test_meta_columns_nested_stacked_explode(spark, sf_dir):
    """meta_columns_nested walks the full schema with ONE stacked
    explode chain (≤2 Generates for array-in-array) and ≤3 exchanges
    (leaf agg + distinct + the left join back to the schema leaf list)
    — never a per-column job or a per-leaf shuffle."""
    plan = _plan(spark, sf_dir, "meta_columns_nested")
    assert plan.count("Exchange hashpartitioning") <= 3, plan[:1500]
    assert plan.count("Generate") <= 2
    assert "CartesianProduct" not in plan


def test_resample_single_window(spark, sf_dir):
    """events_resample_1h_fill: LOCF + lerp share ONE Window operator
    on one partitioning; the grid explode is one Generate; ≤3 total
    exchanges (groupBy, window, span-guard probe)."""
    plan = _plan(spark, sf_dir, "events_resample_1h_fill")
    assert plan.count("Window") == 1, plan[:1500]
    assert plan.count("Generate") == 1
    assert plan.count("Exchange hashpartitioning") <= 3


def test_snowflake_roundtrip_broadcast_only(spark, sf_dir):
    """snowflake_roundtrip: dim joins broadcast, one agg exchange —
    no sort-merge join of the fact table."""
    plan = _plan(spark, sf_dir, "snowflake_roundtrip")
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_semantic_banded_pairs_no_cartesian(spark, sf_dir):
    """dedup_semantic_banded_pairs: the vector table is paired only
    through band equi-joins; nested-loop operators may appear ONLY as
    broadcast (the centroid/knob tables) — a plain CartesianProduct or
    a sort-merge explosion of the pair space must fail here. Cache
    cleared first — the canonical-cold-plan rule, see
    test_embedding_cosine_bulk_banded_equijoins."""
    spark.catalog.clearCache()
    plan = _plan(spark, sf_dir, "dedup_semantic_banded_pairs")
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") <= 2, plan[:1500]
    # r14 bounded fan-out: the persisted canon subtree (which here
    # carries the k-means chain) is re-PRINTED per helper reference;
    # the member payload still crosses one exchange — see
    # test_embedding_cosine_bulk_banded_equijoins.
    assert plan.count("Exchange hashpartitioning") <= 64


def test_silhouette_broadcast_centroid_geometry(spark, sf_dir):
    """sim_silhouette: centroid-sized tables broadcast; the vector
    corpus is never nested-loop paired with itself. Cache cleared
    first — the canonical-cold-plan rule."""
    spark.catalog.clearCache()
    plan = _plan(spark, sf_dir, "sim_silhouette")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 13, plan[:1500]

"""Query catalog: importing this package registers every query/oracle pair.

Module per SURVEY.md §2 area; each import populates
``registry.QUERIES`` / ``registry.ORACLES`` via decorator side effects.
"""

from . import (  # noqa: F401
    q_aggs,
    q_aggs2,
    q_analytics,
    q_edges,
    q_events,
    q_expr,
    q_ext,
    q_ext2,
    q_ext3,
    q_ext4,
    q_ext5,
    q_ext6,
    q_ext7,
    q_ext8,
    q_ext9,
    q_flagship,
    q_joins,
    q_jx,
    q_misc,
    q_nested,
    q_sampling,
    q_setops_sort,
    q_sketches,
    q_tpch,
    q_tpch2,
    q_windows,
)
from .registry import ORACLES, QUERIES

# The verify driver samples a PREFIX of this dict (50 entries in r1), so
# put a representative spread across every SURVEY.md §2 area first — the
# remainder keeps registration order. Every entry is oracle-paired and
# locally parity-checked either way.
_FRONT = [
    # r7 rotation (VERDICT r6 #1, round 4): the never-driver-checked
    # backlog is now derived PROGRAMMATICALLY from CORRECTNESS_r*.json
    # ∪ registry by queries/backlog.py (the r6 hand count said 53; the
    # true number was 68 — the 15 deferred builtin wrappers had been
    # dropped from the arithmetic; tests/test_backlog.py asserts the
    # derivation and this prefix's composition every run). This prefix
    # is ALL first-time driver evidence: queries NEW in r7 lead (new
    # code carries the most risk, the standing policy), then backlog
    # entries newest-displaced-first — the 11 r6-displaced tail entries,
    # then the rest in registry order. The remainder (18 oldest
    # builtin-wrapper/composition entries + whatever this round's new
    # queries displace) goes in the r8 prefix, after which every
    # registered query has driver history and the rotation class
    # retires into the freshness policy encoded in
    # backlog.rotation_order(): new queries first, back-filled with the
    # least-recently-driver-checked.
    # --- queries NEW in r7 lead (added as they land; each one
    # displaces the current tail entry to the r8 backlog) ---
    "dedup_embedding_cosine_bulk",
    "dedup_prefix_stable_order_delta", "dedup_prefix_order_staleness",
    "agg_kendall_tau_sampled", "sim_bottomk_setops", "jx_bottomk_setops",
    # --- the 11 entries the r6 prefix displaced past position 50 ---
    "dedup_index_delta_pairs", "dedup_cdc_chunks",
    "dedup_exact_substr_removal", "dedup_winnowing_index_pairs",
    "corpus_source_containment", "etl_skew_audit",
    "sample_priority_weighted", "text_bm25_from_index",
    "text_hybrid_rrf_topk", "sim_knn_components", "agg_argmax_join_back",
    # --- remaining backlog, registry order ---
    "window_range_trailing_7d", "dedup_simhash_pairs",
    "dedup_minhash_estimate", "dedup_near_dup_clusters",
    "dedup_canonical_docs", "pack_token_bins", "text_decontamination",
    "text_bpe_token_counts", "text_rolling_fingerprint",
    "text_quality_percentile_filter", "text_boilerplate_coverage",
    "text_unigram_rarity", "text_url_kit", "corpus_host_stats",
    "text_fuzzy_title_pairs", "text_length_batches",
    "sample_mixture_budget", "corpus_curriculum_order",
    "dedup_keep_best_quality", "multimodal_frame_energy",
    "text_bigram_lift", "text_vocab_growth",
    "corpus_tokens_by_quality_cut", "sample_temperature_mixture",
    "etl_manifest_pruned_2d", "sim_knn_density_outliers",
    "text_term_drift_tv", "text_tokenizer_fertility",
    "corpus_multi_eval_overlap", "sample_dedup_aware",
    "text_budget_truncate", "text_vocab_coverage_curve",
    "text_term_burstiness",
]

# Prior rounds' driver prefixes (_FRONT_R5 / _FRONT_R6) were kept
# here as history through r6; they are dead code — the driver only
# reads the current _FRONT order — so they now live in git history
# (commits tagged "round 5/6") and in the CORRECTNESS_r*.json
# artifacts, which backlog.py derives evidence from.


def _reorder() -> None:
    assert not (missing := [n for n in _FRONT if n not in QUERIES]), missing
    rest = [n for n in QUERIES if n not in _FRONT]
    for d in (QUERIES, ORACLES):
        ordered = {n: d[n] for n in [*_FRONT, *rest] if n in d}
        d.clear()
        d.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES"]

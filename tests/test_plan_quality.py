"""Global physical-plan quality gate.

Walks EVERY registered query's executed plan (plan-build only, no
execution) and asserts the two absolute bans hold engine-wide:

- no ``CartesianProduct`` (an unbounded non-broadcast cross join is never
  the right plan at 100 TB), and
- no ``BatchEvalPython`` (row-at-a-time Python UDFs; Arrow-batched
  ``ArrowEvalPython``/``mapInPandas`` are the sanctioned Python boundary).

``BroadcastNestedLoopJoin`` is allowed ONLY for the whitelisted queries
below, each of which crosses against a provably bounded side (a 1-row
aggregate frame, a k-row centroid/model frame, or a documented O(N^2)
brute-force oracle baseline). A new query that introduces BNLJ outside the
whitelist fails here with its plan, at plan-build cost — before it can
melt a cluster.
"""

from __future__ import annotations

import pytest

from realestatedeals_spark.plans import QUERIES

# query -> why BroadcastNestedLoopJoin is acceptable there
_BNLJ_WHITELIST = {
    "x5_embedding_near_dup": "documented O(N^2) brute-force oracle baseline",
    "x3_cosine_topk_bruteforce": "documented O(N^2) brute-force oracle baseline",
    "x3_ivf_topk": "cross vs k-row broadcast centroid frame (model state)",
    "x6_heavy_hitters": "cross vs 1-row broadcast global-total frame",
    "tpch_q22_idle_rich_customers": "cross vs 1-row broadcast avg-balance frame",
    "tpch_q11_important_suppliers": "cross vs 1-row broadcast threshold frame",
    "x4_tfidf_top_terms": "cross vs 1-row broadcast corpus-size frame",
    "x2_winnow_overlap_capped": "cross vs 1-row broadcast corpus-size frame",
    "g3_pagerank": "cross vs 1-row broadcast dangling-mass frame per iteration",
    "g3b_pagerank_micros": "cross vs 1-row broadcast dangling-mass frame per iteration (integer twin of g3)",
    "x6_cms_heavy_hitters": "cross vs 1-row broadcast global-total frame (via heavy_hitters)",
    "x6_cms_arith_heavy_hitters": "cross vs 1-row broadcast global-total frame (via heavy_hitters)",
    "e11_gap_fill_forward": "cross vs 1-row broadcast date-bounds frame (spine generation)",
    "x6_binned_quantiles": "cross vs the 1-row broadcast global bin-grid bounds frame (twice: binning + estimate)",
    "x3_pq_topk": "ADC scan crosses codes vs the bounded broadcast query-LUT frame",
    "x9_rag_retrieval": "linear scan crosses corpus chunks vs the bounded broadcast query-chunk frame",
    "x9_hybrid_retrieval": "linear scan crosses corpus docs vs the bounded broadcast 5-query frame; both retrievers share it",
    "x2_semdedup": "cluster assignment crosses vs the k-row broadcast centroid frame (model state)",
    "x7_temperature_mix": "cross vs 1-row broadcast rate-normalizer frame",
    "x4_term_drift": "cross vs 1-row broadcast corpus-totals frame",
    "x3_filtered_topk": "predicate-filtered linear scan vs the bounded broadcast query frame",
    "audit_referential_integrity": "cross of two 1-row count frames per FK edge",
    "x3_mips_topk": "linear scan vs the bounded broadcast query frame (MIPS baseline)",
    "x9_quantization_impact": "linear scan vs the bounded broadcast query frame, shared by the exact and int8 rankings",
    "e31_rfm_segments": "cross vs the 1-row broadcast corpus-max-ts frame",
    "x7_dedup_aware_split": "cross vs the 1-row broadcast leak-count frame, once per split mode",
    "x4_lm_backoff_score": "cross vs the 1-row broadcast model-total frame",
    "x4_lm_perplexity_filter": "cross vs the 1-row broadcast model-total frame (via the shared scorer)",
    "x4_lm_quality_buckets": "cross vs the 1-row broadcast model-total frame (via the shared scorer)",
    "x7_lm_bucket_sample": "cross vs the 1-row broadcast model-total frame (via the shared scorer)",
}

# query -> why an ordered-but-unpartitioned Window is acceptable there: the
# framed rows are bounded by a DOMAIN (calendar hours/days, distinct price
# points), not by data volume — 100x the events is the same number of days.
# Anything whose frame grows with rows (users, events, docs) must go through
# operators/ranking.global_rank / ntile_exact instead (see e31, x7).
_UNPART_WINDOW_WHITELIST = {
    "e20_user_growth_curve": "cumulative sum over the per-DAY frame (calendar-bounded)",
    "e26_seasonal_decompose": "moving avg/seasonal windows over the per-HOUR frame (calendar-bounded)",
    "e27_cusum_changepoint": "CUSUM + peak rank over the per-HOUR frame (calendar-bounded)",
    "olap_skyline_2d": "running max over the DISTINCT-price frame (price-domain-bounded)",
}

# execute real streaming replays on invocation AND return localCheckpoint
# results (the gate would inspect a truncated RDD-scan plan — no signal
# for minutes of runtime); each is oracle-checked end-to-end instead
_SKIP = {"x3_ivf_stored_topk",  # k-means train + index write at plan build;
         # its pruned-scan property is pinned in tests/test_similarity.py
         "x3_ivf_filtered_topk",  # same (index build at plan time); its
         # PartitionFilters+PushedFilters scan is pinned in test_similarity
         "x3_ivf_incremental",  # same; append-only + DV masking pinned there
         "x3_ivfpq_stored_topk",  # same, plus PQ codebook training
         "x3_ivfpq_rerank_topk",  # same index build; rerank-coverage pytest
         "c3_streaming_cdc", "c4_stateful_user_stats", "c5_stream_dedup",
         "c13_stream_transition_matrix", "c14_stream_catalog_txn",
         "c15_stream_lm_counts", "c16_stream_lm_score",
         "c15b_stream_lm_delta_fold", "c17_stream_media_dedup",
         "c18_stream_hll_state", "c19_stream_ann_score",
         "c6_incremental_agg_view", "c7_streaming_sessions",
         "c8_stream_static_enrich"}


@pytest.mark.parametrize("name", [n for n in QUERIES if n not in _SKIP])
def test_physical_plan_bans(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, (
        f"{name}: CartesianProduct in physical plan — a non-broadcast cross "
        f"join reached the registry\n{plan[:2000]}"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF (BatchEvalPython) — use built-in "
        f"expressions or an Arrow-batched pandas UDF\n{plan[:2000]}"
    )
    if name not in _BNLJ_WHITELIST:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: BroadcastNestedLoopJoin outside the bounded-side "
            f"whitelist — broadcast-cross is only sanctioned against 1-row/"
            f"k-row frames (add to whitelist WITH a boundedness argument if "
            f"intentional)\n{plan[:2000]}"
        )
    if name not in _UNPART_WINDOW_WHITELIST:
        from realestatedeals_spark.util import unpartitioned_windows

        n_upw = unpartitioned_windows(plan)
        assert n_upw == 0, (
            f"{name}: {n_upw} ordered-but-unpartitioned Window op(s) — a "
            f"single-partition sort of the whole frame. Use operators/"
            f"ranking.global_rank / ntile_exact, or whitelist WITH a "
            f"domain-boundedness argument\n{plan[:2000]}"
        )

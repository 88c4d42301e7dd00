#!/usr/bin/env python
"""Catalog-wide physical-plan gate: no CartesianProduct anywhere, and
BroadcastNestedLoopJoin only where the broadcast build side is bounded
BY CONSTRUCTION (a 1-row aggregate, a fixed grid, or a capped query
set) — never a relation that grows with the data.

Motivation (VERDICT r10 "What's wrong" #2): the parsed ASOF LEFT JOIN
desugar compiled to a BNLJ whose build side was the left key set —
correct at sf0.1, a scale-killer at 100x — and its plan gate was
written too narrowly to catch it.  This audit is the wide version: it
walks EVERY batch workload's executed plan and fails on any BNLJ that
is not explicitly allowlisted with the reason its build side is
bounded.  New workloads land on the rotation top, so the per-round
pytest slice (tests/test_plan_audit_catalog.py) gates them
automatically; this script runs the full catalog.

Usage: python scripts/plan_audit_catalog.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Workloads whose executed plan may contain BroadcastNestedLoopJoin,
# each with the reason the broadcast build side is bounded by
# construction (independently re-verified by VERDICT r10's crossJoin
# grep: all but two crossJoins are F.broadcast 1-row totals; the two
# others are a 24-row hour grid and a type-pair grid).
BNLJ_ALLOWLIST: dict[str, str] = {
    # --- 1-row broadcast totals (corpus-level normalizers) ---
    "affinity_basket_pairs": "1-row total-baskets aggregate broadcast",
    "profile_key_skew": "1-row total-rows aggregate broadcast",
    "profile_drift_psi":
        "two 1-row broadcasts (bucket edges, cohort totals) over an "
        "n_buckets-row count table — bounded by construction",
    "profile_drift_ks":
        "two 1-row broadcasts (bucket edges, cohort totals); the CDF "
        "window runs over the bounded n_buckets count rows",
    "profile_theta_setops": "1-row sketch-state rows broadcast",
    "sample_token_budget_mix": "1-row total-token aggregate broadcast",
    "sample_mixture_waterfill":
        "1-row water-level fixpoint broadcast over the checkpointed "
        "|domains|-row stats table — bounded by construction",
    "profile_snapshot_drift":
        "1-row baseline x 1-row current aggregate cross — bounded by "
        "construction (the corpus collapsed in the 2-group agg above)",
    "text_pmi_collocations":
        "1-row pair/token-totals broadcast over the checkpointed "
        "co-occurrence counts — bounded by construction",
    "text_bigram_logprob": "1-row total-count aggregate broadcast",
    "text_bm25_topk": "1-row corpus-stats aggregate broadcast",
    "text_weighted_hybrid_topk":
        "same bounded shapes as the RRF row: bm25's 1-row corpus-stats "
        "broadcast + cosine_topk's single broadcast query row; fusion "
        "windows run over the two <=depth-row lists",
    "text_rrf_hybrid_topk":
        "both halves' allowlisted shapes: bm25's 1-row corpus-stats "
        "broadcast + cosine_topk's single broadcast query row; the "
        "fusion itself is a union of two <=depth-row lists",
    "text_dsir_resample": "1-row weight-normalizer broadcast",
    "text_dsir_weights": "1-row weight-normalizer broadcast",
    "text_lr_train": "1-row gradient/weight state broadcast per step",
    "text_tfidf_topk": "1-row doc-count aggregate broadcast",
    "text_unigram_logprob": "1-row total-count aggregate broadcast",
    "dedup_ngram_jaccard": "1-row total broadcast (Jaccard normalizer)",
    "dedup_ngram_containment":
        "bounded broadcast left side (max_left_id) x corpus — the "
        "verification-stage contract, runs over LSH candidates at scale",
    "dedup_bloom_ngram_decontaminate":
        "1-row Bloom bit-array broadcast (GPT-3-style decontamination)",
    # --- fixed small grids ---
    "join_cross_small":
        "explicit CROSS JOIN of region (5 rows, fixed TPC-H dimension) "
        "x nation filtered to n_nationkey < 3 (3 rows) — bounded by "
        "construction; the catalog's intentional cross-join coverage row",
    "ts_gap_fill_hourly": "24-row hour-grid crossJoin (fixed calendar)",
    "ts_locf_resample": "24-row hour-grid crossJoin (fixed calendar)",
    # --- broadcast codebooks / centroid tables (k cells, k ~ sqrt(n)
    #     by design; the codebook rides as ONE collect_list row) ---
    "dedup_semantic": "1-row centroid codebook broadcast (ivf_assign)",
    "pipeline_semantic_curation": "1-row centroid codebook broadcast",
    "pipeline_embedding_decontamination":
        "1-row centroid codebook broadcast (ann_join shape)",
    "sim_ann_join": "1-row centroid codebook broadcast, both sides",
    "sim_ann_join_recall": "codebook broadcast + capped exact reference",
    "sim_ivf_topk": "1-row centroid codebook broadcast",
    "sim_ivf_topk_trained": "1-row centroid codebook broadcast",
    "sim_ivf_pq_topk": "codebook + PQ table broadcast (k*256 entries)",
    "sim_ivf_sq8_topk": "1-row centroid codebook broadcast",
    "sim_sq8_topk": "capped query-set broadcast (brute baseline)",
    "sim_kmeans_fit": "1-row centroid codebook broadcast per iteration",
    "sim_kmeans_quality":
        "codebook broadcast assign + k x k centroid grid (both "
        "codebook-bounded, never the corpus)",
    # --- capped query sets (brute-force baselines, documented) ---
    "sim_cosine_topk": "query side capped (vec_id < 10) and broadcast",
    "sim_mmr_diversify":
        "query side capped (vec_id < 3) and broadcast; the greedy "
        "re-ranks bounded n-candidate groups via applyInPandas",
    "sim_recall_at_k": "capped query set broadcast (exact reference)",
    "sim_recall_frontier":
        "capped query set + codebook broadcasts per nprobe branch, "
        "plus 1-row stat crosses — every build side bounded; the index "
        "itself is checkpointed and probed, never broadcast",
    "sim_hard_negatives": "sampled query side broadcast (brute baseline)",
}

# Streaming/sink/source workloads execute side-effecting jobs or need
# stream fixtures; their plan quality is pinned by their own tests.
SKIP_PREFIXES = ("streaming_", "sink_", "source_")

# Shuffle budgets (VERDICT r11 item 7): max allowed `Exchange` operator
# COUNT in the executed plan for the heaviest / most regression-prone
# workloads, measured from the round-12 clean tree. A refactor that
# silently adds an exchange to one of these trips the audit the same
# way an unallowlisted BNLJ does. Counts are DISTINCT Exchange nodes in
# the physical plan text (reused exchanges print once per reference —
# counted once here via plan-line dedup); budgets are set AT the
# measured value, not above it, so any growth is a finding.
EXCHANGE_BUDGET: dict[str, int] = {
    # measured 2026-08-16 (r12 clean tree, sf0.001, --exchanges):
    # the ~20 heaviest catalog rows plus the asof regression pair
    "pipeline_semantic_curation": 121,
    "text_lr_train": 46,
    "sim_kmeans_quality": 38,
    "text_dsir_resample": 36,
    "dedup_semantic": 33,
    "sim_ivf_pq_topk": 31,
    "parsed_quantified_forms": 24,
    "dedup_incremental": 24,
    "sim_ivf_topk_trained": 22,
    "sim_kmeans_fit": 20,
    "affinity_basket_pairs": 18,
    "sim_ivf_sq8_topk": 18,
    "text_dsir_weights": 17,
    "dedup_minhash_verify": 17,
    "text_bigram_logprob": 14,
    "tpch_q2": 13,
    "sim_recall_at_k": 13,
    "tpch_q8": 11,
    "tpch_q18": 11,
    "sim_ann_join_recall": 11,
    "tpch_q21": 10,
    "graph_pagerank_sim": 9,
    "sim_ann_join": 4,
    # the r10 regression pair: ONE hash exchange on the equality keys
    # (+ the window sort's reuse prints once); any join reappearing
    # here would also add its exchanges
    "parsed_asof_join": 2,
    "parsed_asof_left_join": 2,
    "parsed_asof_tolerance": 2,
    "parsed_asof_tolerance_left": 2,
    "parsed_asof_multikey": 2,
    # round-13 widening (VERDICT r12 item 7): the dedup family leads
    # and the streaming rows' batch twins — the workloads a refactor
    # is most likely to silently re-shuffle. Measured 2026-08-16 from
    # the round-13 tree at sf0.001; budgets AT the measured value.
    "dedup_exact": 1,
    "dedup_canonical": 1,
    "dedup_quality_rep": 4,
    "dedup_minhash_signatures": 0,
    "dedup_minhash_buckets": 1,
    "dedup_cluster_cc": 0,
    "dedup_embedding_cosine": 4,
    "dedup_block_level": 3,
    "dedup_segments_ccnet": 4,
    "dedup_substring_spans": 4,
    "dedup_bloom_ngram_decontaminate": 8,
    "dedup_ngram_jaccard": 1,
    "dedup_simhash": 0,
    "dedup_materialize": 1,
    # batch twins of the streaming sinks (shared compute bodies:
    # mergeable_rollup / sessionize / hourly window / running totals)
    "events_hourly_rollup": 1,
    "events_sessionize_gap": 1,
    "ts_mergeable_rollup": 2,
    "ts_sessionize": 1,
    "ts_rolling_anomaly": 2,
    "ts_funnel_steps": 1,
    "ts_cohort_retention": 4,
    # round-13 additions, pinned at birth
    "text_weighted_hybrid_topk":
        "same bounded shapes as the RRF row: bm25's 1-row corpus-stats "
        "broadcast + cosine_topk's single broadcast query row; fusion "
        "windows run over the two <=depth-row lists",
    "text_rrf_hybrid_topk": 6,
    "text_unigram_train": 0,
    "text_unigram_encode": 3,
    "text_pii_scrub": 0,
    "text_tokenizer_fertility": 5,
    "join_scd2_pointlookup": 1,
    "text_label_agreement": 4,
    "profile_embedding_dims": 1,
    "sample_curriculum_buckets": 1,
    "profile_winsorize": 3,
    "dedup_cross_source_matrix": 19,
    "join_snapshot_diff": 3,
    "ts_lateness_audit": 2,
    "text_calibration_bins": 4,
    # nearest-direction asof (round 13): ONE keyed exchange, both
    # direction windows from the same sorted partition, no join op
    "join_asof_nearest": 1,
    # waterfill solver: 2 SinglePartition hops + 1 broadcast, all over
    # the eagerly checkpointed |domains|-row stats table (the corpus
    # agg ran once at checkpoint time, outside this plan)
    "sample_mixture_waterfill": 3,
    # snapshot drift audit: the multi-count-distinct Expand agg's
    # exchanges + the 1-row x 1-row broadcast cross
    "profile_snapshot_drift": 5,
    # PMI collocations: totals hops + vocab broadcasts + TakeOrdered,
    # all over the checkpointed pair/unigram count tables
    "text_pmi_collocations": 6,
    # time-weighted average: ONE key exchange serves both the lead
    # window and the final group-by (same partitioning, reused)
    "ts_time_weighted_avg": 1,
    # containment verify stage: one bounded broadcast, zero shuffles
    # beyond the single exchange under the broadcast
    "dedup_ngram_containment": 1,
    # weighted fusion: the two halves' own exchanges + tiny-list hops
    "text_weighted_hybrid_topk": 5,
    # nprobe frontier: |nprobes|=3 probe-join branches over the ONE
    # checkpointed index, each with its own top-k window + three 1-row
    # stat aggregates — an audit/tuning run, not a serving path
    "sim_recall_frontier": 45,
}


def _exchange_count(phys: str) -> int:
    """Distinct Exchange operators in an executedPlan string (dedup by
    line text so a reused exchange subtree counts once)."""
    lines = {ln.strip() for ln in phys.split("\n") if "Exchange" in ln
             and "AQEShuffleRead" not in ln}
    return len(lines)


def audit(sf_dir: str = "/root/testdata/sf0.001"):
    """Return (bad_bnlj, cartesian, errors, exchanges, over_budget)
    for the catalog."""
    from datafusion_sqlgen_spark import get_spark
    from datafusion_sqlgen_spark.workloads import build_queries

    spark = get_spark(app_name="plan-audit-catalog", cpus=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    bad_bnlj: dict[str, str] = {}
    cartesian: dict[str, str] = {}
    errors: dict[str, str] = {}
    exchanges: dict[str, int] = {}
    over_budget: dict[str, str] = {}
    for name, fn in build_queries().items():
        if name.startswith(SKIP_PREFIXES):
            continue
        try:
            df = fn(spark, sf_dir)
            phys = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            errors[name] = str(ex)[:200]
            continue
        exchanges[name] = _exchange_count(phys)
        if (name in EXCHANGE_BUDGET
                and exchanges[name] > EXCHANGE_BUDGET[name]):
            over_budget[name] = (
                f"{exchanges[name]} exchanges > budget "
                f"{EXCHANGE_BUDGET[name]}")
        if "CartesianProduct" in phys:
            cartesian[name] = "CartesianProduct"
        if ("BroadcastNestedLoopJoin" in phys
                and name not in BNLJ_ALLOWLIST):
            lines = [ln.strip()[:120] for ln in phys.split("\n")
                     if "BroadcastNestedLoopJoin" in ln]
            bad_bnlj[name] = "; ".join(lines)
    return bad_bnlj, cartesian, errors, exchanges, over_budget


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    show_exchanges = "--exchanges" in sys.argv
    bad_bnlj, cartesian, errors, exchanges, over_budget = audit(sf_dir)
    for n, v in sorted(errors.items()):
        print(f"ERROR      {n}: {v}")
    for n, v in sorted(cartesian.items()):
        print(f"CARTESIAN  {n}: {v}")
    for n, v in sorted(bad_bnlj.items()):
        print(f"BNLJ       {n}: {v}")
    for n, v in sorted(over_budget.items()):
        print(f"EXCHANGES  {n}: {v}")
    if show_exchanges:
        for n, c in sorted(exchanges.items(), key=lambda kv: -kv[1]):
            print(f"xch {c:3d}  {n}")
    bad = bool(bad_bnlj or cartesian or errors or over_budget)
    if not bad:
        print("clean: no CartesianProduct, all BNLJ sites allowlisted, "
              "all exchange budgets met")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

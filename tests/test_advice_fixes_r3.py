"""Round-4 fixes for round-3 VERDICT/ADVICE process defects.

1. The r3 driver sample silently dropped three intended workloads
   because the _SAMPLE_PRIORITY comment mis-counted the 50-entry
   boundary (VERDICT r3 "What's wrong" §1), and listed a phantom name
   (`expr_scalar_funcs4`) that the `if n in d` filter swallowed
   (ADVICE r3 item 2). These tests count instead of eyeballing: every
   priority name must exist, and the first 50 catalog entries must be
   exactly the intended sample.
"""

import json
import os

from datafusion_sqlgen_spark.workloads import (
    _SAMPLE_PRIORITY,
    build_oracles,
    build_queries,
)

# catalog keys minus union(CORRECTNESS_r01..r03 keys), generated
# programmatically at round-4 start — the workloads with no driver
# correctness row in any round, which this round's sample must cover
NEVER_DRIVER_VERIFIED = [
    "profile_orders", "udf_bpeish_token_count", "agg_pivot_status",
    "setop_union_by_name", "join_salted_skew", "join_range_bucketed",
    "lat_posexplode_embedding", "expr_string_funcs2", "text_fingerprint",
    "text_pack_sequences", "text_redact", "text_word_positions",
    "sample_stable_topk", "sample_hash_split", "ts_locf_resample",
    "sim_lsh_bucket_stats", "sim_embedding_norms", "mm_feature_extract",
    "mm_frame_sample", "tpch_q4", "tpch_q6", "tpch_q7", "tpch_q8",
    "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14",
    "tpch_q15", "tpch_q16", "tpch_q19", "tpch_q20", "tpch_q21",
    "tpch_q22", "text_top_terms",
]


def test_every_priority_name_exists():
    """No phantom names: the silent `if n in d` drop in _sample_order
    must never hide a misspelled or removed workload again."""
    q = build_queries()
    missing = [n for n in _SAMPLE_PRIORITY if n not in q]
    assert missing == [], f"phantom _SAMPLE_PRIORITY names: {missing}"


def test_priority_names_unique():
    assert len(_SAMPLE_PRIORITY) == len(set(_SAMPLE_PRIORITY))


def test_driver_sample_is_exactly_the_first_fifty_priority_names():
    """The driver samples the FIRST 50 entries of queries() in insertion
    order — count, don't eyeball (r3's off-by-three)."""
    first50 = list(build_queries())[:50]
    assert first50 == _SAMPLE_PRIORITY[:50]


def test_all_never_verified_workloads_inside_the_sample():
    """Round-4 rotation goal: every workload that has no CORRECTNESS row
    in rounds 1-3 sits inside this round's 50-entry sample window."""
    first50 = set(list(build_queries())[:50])
    left_out = [n for n in NEVER_DRIVER_VERIFIED if n not in first50]
    assert left_out == [], f"never-verified workloads outside sample: {left_out}"


def test_never_verified_list_matches_correctness_files():
    """The hardcoded list above IS catalog-minus-verified — regenerate
    the comparison instead of trusting the transcription."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verified: set[str] = set()
    for r in (1, 2, 3):
        path = os.path.join(repo, f"CORRECTNESS_r0{r}.json")
        with open(path) as f:
            verified |= set(json.load(f))
    from datafusion_sqlgen_spark.workloads import R4_ADDITIONS

    q = build_queries()
    # round-4 additions have no r1-r3 row by construction; everything
    # else in the catalog is either verified or in the tracked list
    expected = [n for n in q if n not in verified and n not in R4_ADDITIONS]
    assert sorted(expected) == sorted(NEVER_DRIVER_VERIFIED)
    phantoms = [n for n in R4_ADDITIONS if n not in q]
    assert phantoms == [], f"R4_ADDITIONS names not in catalog: {phantoms}"
    overlap = [n for n in R4_ADDITIONS if n in verified]
    assert overlap == [], f"R4_ADDITIONS already driver-verified: {overlap}"


def test_sampled_workloads_have_oracles():
    """Everything in the sample window gets the STRONG driver check
    (rows+schema+hash vs DuckDB) except the two multimodal workloads,
    whose binary featurization is intentionally rows-only."""
    oracles = build_oracles()
    missing = [
        n for n in list(build_queries())[:50]
        if n not in oracles and not n.startswith("mm_")
    ]
    assert missing == [], f"sampled workloads without oracle SQL: {missing}"


def test_kmeans_membership_partitions_corpus(spark):
    """Every corpus vector lands in exactly one cell: n_members sums to
    the corpus size, and components are finite."""
    import math

    from datafusion_sqlgen_spark.operators.similarity import kmeans_fit

    emb = spark.table("embeddings")
    res = kmeans_fit(emb, k=4, n_iter=1).collect()
    per_cell = {}
    for r in res:
        per_cell[r["cell_id"]] = r["n_members"]
        assert math.isfinite(r["component"])
    assert sum(per_cell.values()) == emb.count()

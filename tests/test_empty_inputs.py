"""Empty-input robustness: every operator family must produce an empty
(not crashed, not null-poisoned) result on an empty source — the
degenerate partition case every executor hits at 100 TB."""

import pytest
from pyspark.sql import functions as F

from datafusion_sqlgen_spark.operators import dedup, joins, similarity, text


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.table("documents").filter("doc_id < 0")


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.table("embeddings").filter("vec_id < 0")


def test_dedup_ops_on_empty(spark, empty_docs):
    assert dedup.exact_dedup(empty_docs).count() == 0
    assert dedup.minhash_signatures(empty_docs).count() == 0
    assert dedup.minhash_buckets(empty_docs).count() == 0
    assert dedup.minhash_dedup_pairs(empty_docs).count() == 0
    assert dedup.simhash(empty_docs).count() == 0


def test_text_ops_on_empty(spark, empty_docs):
    assert text.token_stats(empty_docs).count() == 0
    assert text.quality_score(empty_docs).count() == 0
    assert text.language_id(empty_docs).count() == 0
    assert text.top_terms(empty_docs).count() == 0


def test_similarity_ops_on_empty(spark, empty_emb):
    corpus = spark.table("embeddings")
    # empty query set -> no results; empty corpus -> no neighbors
    assert similarity.cosine_topk(corpus, empty_emb).count() == 0
    assert similarity.cosine_topk(empty_emb, corpus.filter("vec_id < 3")).count() == 0
    assert similarity.lsh_bucket_stats(empty_emb).count() == 0
    assert dedup.embedding_near_dup(empty_emb).count() == 0


def test_asof_join_empty_right_keeps_left(spark):
    """As-of is a LEFT join: an empty right side must preserve left rows
    with null as-of columns, not drop them."""
    ev = spark.table("events")
    left = ev.filter("event_type = 'error'").select("event_id", "user_id", "ts")
    right = ev.filter("event_type = 'nope'").select("user_id", "ts", "value")
    out = joins.asof_join(left, right, on="user_id", left_time="ts",
                          right_time="ts", value_cols=["value"])
    assert out.count() == left.count()
    assert out.filter(F.col("value_asof").isNotNull()).count() == 0


def test_salted_join_empty_right(spark):
    orders = spark.table("orders").select("o_orderkey", "o_custkey")
    empty_cust = (
        spark.table("customer")
        .filter("c_custkey < 0")
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    )
    assert joins.salted_join(orders, empty_cust, on="o_custkey").count() == 0
    assert (
        joins.salted_join(orders, empty_cust, on="o_custkey", how="left").count()
        == orders.count()
    )


def test_connected_components_on_empty_edges(spark):
    """Round-4 cc rewrite (fused round 0, lazy checkpoints) must not
    assume a non-empty edge list."""
    edges = (
        spark.table("documents").filter("doc_id < 0")
        .selectExpr("doc_id AS src", "doc_id AS dst")
    )
    assert dedup.connected_components(edges).count() == 0


def test_interval_range_window_on_empty(spark):
    """Interval RANGE frames go through the generated-SQL fallback —
    that path must also degrade to empty, not error."""
    from datafusion_sqlgen_spark.expressions import agg, col, fn, lit
    from datafusion_sqlgen_spark.expressions.core import FrameBound, Interval
    from datafusion_sqlgen_spark.plans import scan

    p = (
        scan("events")
        .filter(col("event_id") < lit(0))
        .select(
            col("event_id"),
            agg("count").over(
                partition_by=[col("event_type")],
                order_by=[col("ts").asc()],
                range_between=(FrameBound(Interval(1, "HOUR")), 0),
            ).alias("n_1h"),
        )
    )
    assert p.to_df(spark).count() == 0


def test_sink_roundtrip_on_empty(spark, tmp_path):
    """Writing an empty partitioned dataset and reading it back must
    yield an empty frame with the projected schema, not a read error."""
    from datafusion_sqlgen_spark.sources import io as sio

    out = str(tmp_path / "empty_sink")
    src = spark.table("orders").filter("o_orderkey < 0") \
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    sio.write_parquet(src, out, partition_by=["o_orderstatus"])
    # no footers to infer from -> schema-on-read is the production pattern
    back = sio.read_parquet(spark, out, schema=src.schema)
    assert back.count() == 0
    assert back.columns == src.columns


def test_round4_ops_on_empty(spark, empty_docs, empty_emb):
    from datafusion_sqlgen_spark.operators import timeseries

    empty_ev = spark.table("events").filter("event_id < 0")
    docs = spark.table("documents")
    assert timeseries.sessionize(empty_ev).count() == 0
    assert timeseries.rolling_anomaly(empty_ev).count() == 0
    # empty corpus -> no rows; empty benchmark -> zero matches, NOT an
    # empty result (every corpus doc must still report n_matched = 0)
    assert text.decontaminate(empty_docs, docs).count() == 0
    d = text.decontaminate(docs, empty_docs)
    assert d.count() == docs.count()
    assert d.filter("n_matched <> 0 OR contaminated").count() == 0
    assert text.repetition_stats(empty_docs).count() == 0
    assert text.tfidf_top_terms(empty_docs).count() == 0
    assert similarity.quantize_int8(empty_emb).count() == 0


def test_round4c_ops_on_empty(spark, empty_docs, empty_emb):
    from datafusion_sqlgen_spark.operators import sampling

    assert dedup.block_dedup(empty_docs).count() == 0
    assert text.c4_filters(empty_docs).count() == 0
    assert sampling.temperature_mix(empty_docs).count() == 0
    corpus = spark.table("embeddings")
    assert similarity.recall_at_k(corpus, empty_emb).count() == 0


def test_kmeans_fit_on_empty(spark, empty_emb):
    assert similarity.kmeans_fit(empty_emb).count() == 0


def test_pca_component_on_empty(spark, empty_emb):
    assert similarity.pca_power_component(empty_emb).count() == 0


def test_key_skew_on_empty(spark):
    from datafusion_sqlgen_spark.operators import profiling

    empty = spark.table("events").filter("event_id < 0")
    assert profiling.key_skew(empty, "user_id").count() == 0


def test_incremental_dedup_edges(spark, empty_docs):
    docs = spark.table("documents")
    # empty new batch -> nothing admitted; empty corpus -> all admitted
    assert dedup.incremental_dedup(empty_docs, docs).count() == 0
    n = docs.count()
    from datafusion_sqlgen_spark.operators.dedup import exact_dedup

    distinct_new = dedup.incremental_dedup(docs, empty_docs).count()
    assert distinct_new == n  # per-row admit (dups only vs CORPUS)


def test_funnel_cohort_on_empty(spark):
    from datafusion_sqlgen_spark.operators import timeseries

    empty = spark.table("events").filter("event_id < 0")
    assert timeseries.funnel(empty).count() == 0
    assert timeseries.cohort_retention(empty).count() == 0


def test_unigram_logprob_on_empty(spark, empty_docs):
    assert text.unigram_logprob(empty_docs).count() == 0


def test_round4d_ops_on_empty(spark, empty_docs):
    from datafusion_sqlgen_spark.operators import sampling

    assert text.gopher_filters(empty_docs).count() == 0
    assert sampling.deterministic_shuffle(empty_docs).count() == 0
    assert dedup.quality_dedup(empty_docs).count() == 0


def test_bm25_on_empty(spark, empty_docs):
    assert text.bm25_topk(empty_docs, ["hash"]).count() == 0


def test_pq_encode_on_empty(spark, empty_emb):
    assert similarity.pq_encode(empty_emb, dim=64, m=4).count() == 0


def test_correlation_matrix_on_empty(spark):
    from datafusion_sqlgen_spark.operators import profiling

    empty = spark.table("lineitem").filter("l_orderkey < 0")
    out = profiling.correlation_matrix(empty, ["l_quantity", "l_tax"])
    rows = out.collect()
    # the stack emits the pair row with NULL corr (no data, not no row)
    assert len(rows) == 1 and rows[0].corr is None


def test_round4d_late_ops_on_empty(spark, empty_docs):
    from datafusion_sqlgen_spark.operators import joins, sampling

    assert text.ngram_counts(empty_docs).count() == 0
    assert text.language_id_confidence(empty_docs).count() == 0
    assert sampling.kfold_assign(empty_docs).count() == 0
    docs = spark.table("documents")
    # resample with an empty target: every doc scores OOV-vs-OOV, the
    # ratio degenerates but must not error or drop the corpus contract
    out = text.dsir_resample(empty_docs, docs)
    assert out.count() == 0
    # overlap join with an empty side yields no pairs
    lhs = spark.createDataFrame([(1, 0.0, 10.0)], ["a", "lo", "hi"])
    empty_rhs = lhs.filter("a < 0").selectExpr(
        "a AS b", "lo AS rlo", "hi AS rhi"
    )
    assert joins.interval_overlap_join(
        lhs, empty_rhs, "lo", "hi", "rlo", "rhi", 5.0
    ).count() == 0


def test_round4d_final_ops_on_empty(spark):
    from datafusion_sqlgen_spark.operators import (
        affinity, joins, profiling, sampling, similarity, timeseries,
    )

    empty_ev = spark.table("events").filter("event_id < 0")
    empty_li = spark.table("lineitem").filter("l_orderkey < 0")
    empty_emb = spark.table("embeddings").filter("vec_id < 0")
    docs = spark.table("documents")
    assert timeseries.mergeable_rollup(empty_ev).count() == 0
    assert profiling.robust_stats(empty_ev).count() == 0
    assert similarity.component_stats(empty_emb).count() == 0
    assert affinity.basket_pairs(empty_li).count() == 0
    assert sampling.capped_per_group(
        docs.filter("doc_id < 0"), 5
    ).count() == 0
    # upsert with empty updates is identity; empty current is the batch
    cur = docs.select("doc_id", "source")
    empty = cur.filter("doc_id < 0")
    assert joins.upsert(cur, empty, "doc_id").count() == cur.count()
    assert joins.upsert(empty, cur, "doc_id").count() == cur.count()


def test_round6_sketches_on_empty(spark):
    """CMS, Bloom, binned quantiles on an empty source: empty state,
    empty estimates, no crash."""
    from datafusion_sqlgen_spark.operators import profiling

    empty_ev = spark.table("events").filter("event_id < 0")
    assert profiling.cms_sketch(empty_ev, "user_id").count() == 0
    assert profiling.cms_heavy_hitters(empty_ev, "user_id").count() == 0
    assert profiling.binned_quantile_sketch(empty_ev).count() == 0
    assert profiling.binned_quantiles(empty_ev).count() == 0
    assert profiling.hll_registers(empty_ev).count() == 0


def test_bloom_on_empty_sides(spark, empty_docs):
    """Empty member set -> empty filter -> every probe is a definite
    non-member; empty probe set -> no flags."""
    docs = spark.table("documents")
    keys = docs.select(F.md5(F.col("text")).alias("fp"), "doc_id")
    empty_keys = keys.filter("doc_id < 0")
    bloom_empty = dedup.bloom_build(empty_keys, "fp")
    assert bloom_empty.count() == 0
    flags = dedup.bloom_maybe_contains(
        keys.limit(5), "fp", bloom_empty, "doc_id"
    )
    assert flags.where(F.col("bloom_hit")).count() == 0
    assert dedup.bloom_maybe_contains(
        empty_keys, "fp", dedup.bloom_build(keys, "fp"), "doc_id"
    ).count() == 0


def test_ivf_pq_on_empty_queries(spark, empty_emb):
    from datafusion_sqlgen_spark.operators import similarity as sim

    corpus = spark.table("embeddings")
    assert sim.ivf_pq_topk(corpus, empty_emb).count() == 0


def test_substring_spans_on_empty(spark, empty_docs):
    assert dedup.substring_span_stats(empty_docs).count() == 0


def test_phash_pairs_on_empty(spark, empty_docs):
    from datafusion_sqlgen_spark.operators import multimodal as mm

    empty_mm = mm.as_multimodal(empty_docs.select("doc_id", "text"))
    assert mm.perceptual_hash(empty_mm).count() == 0
    assert mm.phash_near_dup_pairs(empty_mm).count() == 0


def test_segment_dedup_on_empty(spark, empty_docs):
    assert dedup.segment_dedup(empty_docs).count() == 0


def test_pagerank_on_empty_graph(spark, empty_docs):
    from datafusion_sqlgen_spark.operators import graph

    edges = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    assert graph.pagerank(edges, iterations=2).count() == 0


def test_bigram_logprob_on_empty(spark, empty_docs):
    assert text.bigram_interp_logprob(empty_docs).count() == 0


def test_sq8_topk_on_empty(spark):
    from datafusion_sqlgen_spark.operators import similarity

    empty = spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    assert similarity.sq8_topk(empty, empty).count() == 0


def test_lr_train_on_empty(spark, empty_docs):
    assert text.lr_train_hashed(empty_docs).count() == 0


def test_ivf_sq8_topk_on_empty(spark):
    from datafusion_sqlgen_spark.operators import similarity

    empty = spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    assert similarity.ivf_sq8_topk(empty, empty).count() == 0

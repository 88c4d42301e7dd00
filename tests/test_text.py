

def test_bpe_train_merges_matches_oracle_and_is_deterministic(spark, duck):
    """Round-8 BPE trainer: merge table matches the iteration-unrolled
    DuckDB twin exactly, ranks are dense, and re-running is
    bit-identical (no RNG anywhere)."""
    from tests.test_operators import check

    from datafusion_sqlgen_spark.operators import text as tx

    out = tx.bpe_train_merges(spark.table("documents"))
    rows = check(spark, duck, out, tx.bpe_train_merges_oracle())
    assert len(rows) == 6
    first = sorted(map(tuple, out.collect()))
    again = sorted(map(tuple, tx.bpe_train_merges(
        spark.table("documents")).collect()))
    assert again == first


def test_bpe_encode_matches_oracle_and_conserves_tokens(spark, duck):
    """Round-10 serving half: per-doc token budgets match the DuckDB
    twin (which re-derives the rules), every doc has n_tokens between
    n_words (fully merged) and total chars (no merges applied), and
    encoding with ZERO merges degenerates to character counts."""
    from pyspark.sql import functions as F

    from tests.test_operators import check

    from datafusion_sqlgen_spark.operators import text as tx

    docs = spark.table("documents")
    merges = tx.bpe_train_merges(docs)
    out = tx.bpe_encode(docs, merges)
    rows = check(spark, duck, out, tx.bpe_encode_oracle())
    assert len(rows) > 0
    assert all(r[2] >= r[1] for r in rows)  # (doc_id, n_words, n_tokens)
    # zero merges: every word tokenizes to its characters
    none = tx.bpe_encode(docs, merges.limit(0))
    chars = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))),
                              r"\s+")).alias("w"),
        )
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("doc_id")
        .agg(F.sum(F.length("w")).cast("bigint").alias("n_chars"))
    )
    j = none.join(chars, "doc_id").where(
        F.col("n_tokens") != F.col("n_chars")
    )
    assert j.count() == 0


def test_bpe_merges_compose(spark):
    """A later merge may build on an earlier one (multi-char symbols
    appear once pairs chain), and pair counts are non-increasing."""
    from datafusion_sqlgen_spark.operators import text as tx

    rows = sorted(
        map(tuple, tx.bpe_train_merges(
            spark.table("documents"), n_merges=8).collect())
    )
    counts = [r[3] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_vocab_growth_curve_properties(spark, duck):
    """Heaps curve invariants: cumulative counts strictly positive and
    non-decreasing per source, final cum_vocab <= final cum_tokens,
    slope in (0, 1] for natural-ish text, and the bucket checkpoints
    hash-equal to the DuckDB twin."""
    from datafusion_sqlgen_spark.operators import text as T

    rows = T.vocab_growth(spark.table("documents")).collect()
    assert rows
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.bucket)
        toks = [r.cum_tokens for r in rs]
        voc = [r.cum_vocab for r in rs]
        assert toks == sorted(toks) and voc == sorted(voc)
        assert 0 < voc[-1] <= toks[-1]
        # synthetic docs share a tiny vocabulary, so saturation
        # (slope ~ 0) is legitimate at test SF; natural text reads
        # 0.4-0.6
        assert 0 <= rs[0].heaps_slope <= 1.0, (src, rs[0].heaps_slope)
        assert all(r.heaps_slope == rs[0].heaps_slope for r in rs)
    assert any(rs[0].heaps_slope > 0 for rs in by_src.values())
    want = sorted(map(tuple, duck.execute(T.vocab_growth_oracle()).fetchall()))
    got = sorted(map(tuple, (tuple(r) for r in rows)))
    assert got == want

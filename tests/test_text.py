

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

"""The NULL-text contract: text/dedup operators require non-null text
(engines diverge on NULL: Spark legacy size(split(NULL)) = -1, DuckDB
len(NULL) = NULL — booleans and counts then disagree). The documented
fix is ONE coalesce at ingest (text.prepare_documents); these tests
prove the operators match their DuckDB oracles on NULL-bearing corpora
once that step runs, and that the divergence is real without it."""

import pandas as pd
import pytest

from datafusion_sqlgen_spark.operators import dedup, text

ROWS = [
    (1, "the quick brown fox", "en", "s0", 19),
    (2, None, "en", "s0", 0),
    (3, "", "en", "s1", 0),
    (4, "the quick brown fox", "de", "s1", 19),
]
COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@pytest.fixture(scope="module")
def null_env(spark):
    import duckdb

    df = spark.createDataFrame(
        ROWS, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    prepared = text.prepare_documents(df)
    con = duckdb.connect()
    con.register("raw_docs", pd.DataFrame(ROWS, columns=COLS))
    # the oracle sees the SAME normalization, applied at the view level
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id, coalesce(text, '') AS text,"
        " lang, source, n_chars FROM raw_docs"
    )
    return prepared, con


def _cmp(sdf, con, osql):
    got = sorted(
        (tuple(r) for r in sdf.collect()),
        key=lambda r: tuple(str(x) for x in r),
    )
    want = sorted(
        con.execute(osql).fetchall(), key=lambda r: tuple(str(x) for x in r)
    )
    assert got == want, f"\nspark: {got}\nduck : {want}"


def test_token_stats_on_prepared_nulls(null_env):
    prepared, con = null_env
    _cmp(text.token_stats(prepared), con, text.token_stats_oracle())


def test_c4_filters_on_prepared_nulls(null_env):
    prepared, con = null_env
    _cmp(text.c4_filters(prepared), con, text.c4_filters_oracle())


def test_quality_score_on_prepared_nulls(null_env):
    prepared, con = null_env
    _cmp(text.quality_score(prepared), con, text.quality_score_oracle())


def test_block_dedup_on_prepared_nulls(null_env):
    prepared, con = null_env
    _cmp(dedup.block_dedup(prepared), con, dedup.block_dedup_oracle())


def test_exact_dedup_on_prepared_nulls(null_env):
    prepared, con = null_env
    _cmp(dedup.exact_dedup(prepared), con, dedup.exact_dedup_oracle())


def test_divergence_is_real_without_preparation(spark):
    """Un-normalized NULL text genuinely diverges (Spark -1 vs DuckDB
    NULL) — the contract exists for a reason; if Spark ever changes the
    legacy size(NULL) behavior this canary flags the contract for
    review."""
    df = spark.createDataFrame(
        [(1, None)], "doc_id bigint, text string"
    )
    row = text.token_stats(df).collect()[0]
    assert row["n_tokens"] == -1


def test_gopher_filters_on_prepared_nulls(null_env):
    prepared, con = null_env
    _cmp(text.gopher_filters(prepared), con, text.gopher_filters_oracle())


def test_classifier_score_on_prepared_nulls(null_env, spark):
    prepared, con = null_env
    sdf = text.classifier_score(prepared, text.make_hash_weights(spark))
    # NULL and '' docs produce zero grams on both engines -> absent rows
    _cmp(sdf, con, text.classifier_score_oracle())

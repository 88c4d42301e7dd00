"""Explode/Unnest plan operator: dual-render + oracle + outer semantics."""

from datafusion_sqlgen_spark.expressions import agg, col, fn, lit, when
from datafusion_sqlgen_spark.plans import scan
from tests.conftest import assert_plan_matches_oracle


def _even_odd_arrays(n_elems: int):
    """CASE WHEN doc_id % 2 = 0 THEN [doc_id, ...] ELSE [] END — gives the
    outer-explode tests rows with empty arrays (none exist in the data)."""
    elems = [col("doc_id") + i for i in range(n_elems)]
    empty = fn("slice", fn("array", lit(0)), lit(1), lit(0))
    return when(col("doc_id") % 2 == 0, fn("array", *elems)).otherwise(empty)


def test_explode_words_oracle(spark, duck):
    p = (
        scan("documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), fn("split", col("text"), lit(" ")).alias("words"))
        .explode(col("words"), "word")
        .filter(fn("length", col("word")) > 0)
        .group_by(col("word"))
        .agg(agg("count").alias("n"))
        .sort(col("n").desc(), col("word").asc())
        .limit(20)
    )
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert len(rows) == 20


def test_posexplode_positions_oracle(spark, duck):
    p = (
        scan("embeddings")
        .filter(col("vec_id") < 5)
        .explode(col("embedding"), "val", pos_alias="pos")
        .select(
            col("vec_id"),
            col("pos").cast("int").alias("pos"),
            fn("round", col("val").cast("double"), lit(4)).alias("val"),
        )
        .sort(col("vec_id").asc(), col("pos").asc())
    )
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert len(rows) > 0
    assert min(r[1] for r in rows) == 0  # 0-based positions on both engines


def test_explode_inner_drops_empty(spark, duck):
    p = (
        scan("documents")
        .filter(col("doc_id") < 6)
        .select(col("doc_id"), _even_odd_arrays(1).alias("xs"))
        .explode(col("xs"), "x")
        .select(col("doc_id"), col("x"))
        .sort(col("doc_id").asc())
    )
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert len(rows) == 3  # only even doc_ids survive


def test_explode_outer_keeps_empty(spark, duck):
    p = (
        scan("documents")
        .filter(col("doc_id") < 5)
        .select(col("doc_id"), _even_odd_arrays(1).alias("xs"))
        .explode(col("xs"), "x", outer=True)
        .select(col("doc_id"), col("x"))
        .sort(col("doc_id").asc())
    )
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert len(rows) == 5  # odd ids kept with NULL x


def test_explode_outer_with_positions(spark, duck):
    p = (
        scan("documents")
        .filter(col("doc_id") < 5)
        .select(col("doc_id"), _even_odd_arrays(2).alias("xs"))
        .explode(col("xs"), "x", pos_alias="p", outer=True)
        .select(col("doc_id"), col("p").cast("int").alias("p"), col("x"))
        .sort(col("doc_id").asc(), col("p").asc())
    )
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert len(rows) == 3 * 2 + 2  # even ids -> 2 rows each, odd -> 1 NULL row

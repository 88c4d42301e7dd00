"""Expression IR unit tests: SQL rendering in both dialects.

No SparkSession needed — pure rendering checks, plus DuckDB execution of
rendered scalar expressions (fast sanity oracle).
"""

import duckdb
import pytest

from datafusion_sqlgen_spark.expressions import (
    Case,
    col,
    fn,
    lit,
    star,
    when,
)


def duck_eval(sql_expr: str):
    return duckdb.sql(f"SELECT {sql_expr} AS v").fetchall()[0][0]


def test_col_rendering():
    assert col("c1").to_sql("spark") == "c1"
    assert col("t.c1").to_sql("spark") == "t.c1"
    assert col("weird col").to_sql("spark") == "`weird col`"
    assert col("weird col").to_sql("duckdb") == '"weird col"'


def test_literals():
    assert lit(1).to_sql() == "1"
    assert lit(1.5).to_sql() == "1.5"
    assert lit(None).to_sql() == "NULL"
    assert lit(True).to_sql() == "TRUE"
    assert lit("o'brien").to_sql() == "'o''brien'"


def test_binop_parenthesized():
    e = (col("a") + 1) * col("b")
    assert e.to_sql("spark") == "((a + 1) * b)"


def test_comparison_and_bool():
    e = (col("a") > 1) & (col("b") <= 2) | (col("c") != 3)
    sql = e.to_sql("spark")
    assert sql == "(((a > 1) AND (b <= 2)) OR (c <> 3))"


def test_xor_dialect_split():
    e = fn("abs", col("a"))
    assert e.to_sql("spark") == "abs(a)"
    from datafusion_sqlgen_spark.expressions.core import BinOp

    x = BinOp("^", col("a"), col("b"))
    assert x.to_sql("spark") == "(a ^ b)"
    assert x.to_sql("duckdb") == "xor(a, b)"  # duckdb ^ is exponentiation


def test_null_safe_polarity():
    """SURVEY.md §7 hard-part 5: IS DISTINCT FROM <-> <=> polarity."""
    from datafusion_sqlgen_spark.expressions.core import IsDistinctFrom

    e = IsDistinctFrom(lit(1), lit(None))
    assert duck_eval(e.to_sql("duckdb")) is True
    e2 = lit(1).eq_null_safe(lit(None))
    assert duck_eval(e2.to_sql("duckdb")) is False


def test_between_and_negation():
    e = col("x").between(1, 10)
    assert e.to_sql() == "(x BETWEEN 1 AND 10)"
    from datafusion_sqlgen_spark.expressions.core import Between

    n = Between(col("x"), lit(1), lit(10), negated=True)
    assert n.to_sql() == "(x NOT BETWEEN 1 AND 10)"


def test_case_when():
    e = when(col("x") > 0, "pos").when(col("x") < 0, "neg").otherwise("zero")
    sql = e.to_sql("duckdb")
    assert duckdb.sql(f"SELECT {sql.replace('x', '5')}").fetchall()[0][0] == "pos"


def test_index_is_one_based():
    """Reference semantics: some_list[1] = first element (tests/select.rs:276)."""
    e = col("arr")[1]
    assert e.to_sql("spark") == "element_at(arr, 1)"
    assert e.to_sql("duckdb") == "(arr)[1]"
    assert duckdb.sql("SELECT ([10,20,30])[1]").fetchall()[0][0] == 10


def test_log_is_natural_log_in_both_dialects():
    """DataFusion/Spark log() = ln; DuckDB log() = log10. Canonical 'ln'."""
    e = fn("log", lit(2.718281828459045))
    assert abs(duck_eval(e.to_sql("duckdb")) - 1.0) < 1e-9


def test_sortkey_explicit_direction_and_nulls():
    """The reference drops NULLS FIRST/LAST and inverts ASC/DESC
    (sqlgenerator/src/lib.rs:141-148); we always emit both explicitly."""
    k = col("a").desc(nulls_first=False)
    assert k.to_sql() == "a DESC NULLS LAST"
    k2 = col("a").asc()
    assert k2.to_sql() == "a ASC NULLS FIRST"


def test_window_sql():
    e = fn("row_number").over(
        partition_by=[col("g")], order_by=[col("v").desc()]
    )
    assert (
        e.to_sql("spark")
        == "row_number() OVER (PARTITION BY g ORDER BY v DESC NULLS LAST)"
    )


def test_star():
    assert star().to_sql() == "*"
    assert star("t").to_sql() == "t.*"


def test_in_list():
    e = col("x").isin(1, 2, 3)
    assert e.to_sql() == "(x IN (1, 2, 3))"


def test_cast_dialects():
    e = col("x").cast("string")
    assert e.to_sql("spark") == "CAST(x AS STRING)"
    assert e.to_sql("duckdb") == "CAST(x AS VARCHAR)"


def test_ilike_dual_render(spark, duck):
    from datafusion_sqlgen_spark.expressions import col
    from datafusion_sqlgen_spark.plans import scan
    from tests.conftest import assert_plan_matches_oracle

    p = scan("part").filter(col("p_name").ilike("%RED%")).select(col("p_partkey"))
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert len(rows) > 0  # 'red widget' matches case-insensitively


def test_lambda_sql_both_dialects():
    from datafusion_sqlgen_spark.expressions import fn, lam

    e = fn("transform", col("arr"), lam("x", lambda x: x * lit(2)))
    assert e.to_sql("spark") == "transform(arr, x -> (x * 2))"
    assert e.to_sql("duckdb") == "list_transform(arr, x -> (x * 2))"

    agg2 = fn(
        "aggregate", col("arr"), lit(0),
        lam(("acc", "x"), lambda acc, x: acc + x),
    )
    assert agg2.to_sql("spark") == "aggregate(arr, 0, (acc, x) -> (acc + x))"
    assert (
        agg2.to_sql("duckdb")
        == "list_reduce(list_prepend(0, arr), (acc, x) -> (acc + x))"
    )


def test_lambda_zip_with_duckdb_rewrites_to_index_join():
    from datafusion_sqlgen_spark.expressions import fn, lam

    e = fn("zip_with", col("a"), col("b"), lam(("x", "y"), lambda x, y: x * y))
    assert e.to_sql("spark") == "zip_with(a, b, (x, y) -> (x * y))"
    # DuckDB 1.0 has no zip_with; the body is substituted over an index
    # join that runs to the LONGER array (Spark pads the shorter with NULL)
    assert e.to_sql("duckdb") == (
        "list_transform(range(1, greatest(len(a), len(b)) + 1), "
        "__zw_i -> ((a)[__zw_i] * (b)[__zw_i]))"
    )


def test_lambda_substitution_respects_shadowing():
    from datafusion_sqlgen_spark.expressions import fn, lam, substitute

    # outer substitution must not touch the rebound inner param `x`
    inner = lam("x", lambda x: x + col("y"))
    out = substitute(
        fn("transform", col("arr"), inner), {"x": lit(99), "y": lit(1)}
    )
    assert out.to_sql("spark") == "transform(arr, x -> (x + 1))"


def test_lambda_column_path_executes(spark):
    from datafusion_sqlgen_spark.expressions import fn, lam
    import pyspark.sql.functions as F

    e = fn(
        "aggregate",
        fn("zip_with", col("a"), col("b"), lam(("x", "y"), lambda x, y: x * y)),
        lit(0).cast("bigint"),
        lam(("acc", "v"), lambda acc, v: acc + v),
    )
    df = spark.createDataFrame([([1, 2, 3], [10, 20, 30])], "a array<int>, b array<int>")
    got = df.select(e.to_column().alias("dot")).collect()[0][0]
    assert got == 10 + 40 + 90


def test_ignore_nulls_renders_per_dialect():
    from datafusion_sqlgen_spark.expressions import Func

    e = Func("last_value", (col("v"),), ignore_nulls=True).over(
        partition_by=[col("g")], order_by=[col("i").asc()]
    )
    assert "last_value(v) IGNORE NULLS OVER" in e.to_sql("spark")
    assert "last_value(v IGNORE NULLS) OVER" in e.to_sql("duckdb")


def test_lag_ignore_nulls_falls_back_to_sql_path(spark):
    """lag IGNORE NULLS has no PySpark Column form — the plan layer must
    transparently execute via generated SQL and still be right."""
    from datafusion_sqlgen_spark.expressions import Func
    from datafusion_sqlgen_spark.plans import Values

    v = Values(rows=((1, 10), (2, None), (3, 30)), columns=("i", "v"))
    p = v.select(
        col("i"),
        Func("lag", (col("v"),), ignore_nulls=True)
        .over(order_by=[col("i").asc()])
        .alias("prev_non_null"),
    ).sort(col("i").asc())
    got = [tuple(r) for r in p.to_df(spark).collect()]
    assert got == [(1, None), (2, 10), (3, 10)]

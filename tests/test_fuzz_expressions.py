"""Property-based dual-render fuzzing: random expression trees must
produce identical results through all three paths —

    expr.to_df(spark)  ==  spark.sql(expr.to_sql("spark"))  ==  duckdb(expr.to_sql("duckdb"))

This generalizes the reference's round-trip-identity test strategy
(SURVEY.md §5.1) from ten fixed strings to the whole expression algebra,
including NULL propagation, which is where dialects usually diverge.
"""

import math

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from datafusion_sqlgen_spark.expressions import col, lit, when
from datafusion_sqlgen_spark.expressions.core import IsDistinctFrom
from datafusion_sqlgen_spark.plans import scan

ROWS = [
    (0, None, "alpha"),
    (1, 7, None),
    (-3, 2, "Beta"),
    (42, -9, "gamma gamma"),
    (None, 4, ""),
    (5, 5, "delta"),
    (-100, 100, "ALPHA"),
    (17, None, None),
]


@pytest.fixture(scope="module")
def fuzz_env(spark):
    pdf = pd.DataFrame(ROWS, columns=["x", "y", "s"]).astype(
        {"x": "Int64", "y": "Int64"}
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("fuzz_t")
    con = duckdb.connect()
    con.register("fuzz_t", pdf)
    return spark, con


def num_leaf():
    return st.one_of(
        st.just(col("x")),
        st.just(col("y")),
        st.integers(-5, 5).map(lit),
        st.just(lit(None)),
    )


def numeric(depth: int):
    if depth <= 0:
        return num_leaf()
    sub = numeric(depth - 1)
    return st.one_of(
        num_leaf(),
        st.tuples(sub, sub).map(lambda t: t[0] + t[1]),
        st.tuples(sub, sub).map(lambda t: t[0] - t[1]),
        st.tuples(sub, sub).map(lambda t: t[0] * t[1]),
        # non-ANSI semantics: x/0 and x%0 are NULL in both engines
        st.tuples(sub, sub).map(lambda t: t[0] / t[1]),
        st.tuples(sub, sub).map(lambda t: t[0] % t[1]),
        st.tuples(boolean(depth - 1), sub, sub).map(
            lambda t: when(t[0], t[1]).otherwise(t[2])
        ),
        st.tuples(sub, sub).map(lambda t: __import__(
            "datafusion_sqlgen_spark.expressions", fromlist=["fn"]
        ).fn("coalesce", t[0], t[1])),
        sub.map(lambda e: -e),
    )


def boolean(depth: int):
    nums = numeric(max(depth - 1, 0))
    base = st.one_of(
        st.tuples(nums, nums).map(lambda t: t[0] < t[1]),
        st.tuples(nums, nums).map(lambda t: t[0] == t[1]),
        st.tuples(nums, nums).map(lambda t: t[0] >= t[1]),
        nums.map(lambda e: e.is_null()),
        st.tuples(nums, nums).map(lambda t: IsDistinctFrom(t[0], t[1])),
        st.tuples(nums, nums, nums).map(lambda t: t[0].between(t[1], t[2])),
    )
    if depth <= 0:
        return base
    sub = boolean(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, sub).map(lambda t: t[0] & t[1]),
        st.tuples(sub, sub).map(lambda t: t[0] | t[1]),
        sub.map(lambda e: ~e),
    )


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, 6)
    return int(v)


def _key(t):
    return tuple((v is None, str(type(v)), v if v is not None else 0) for v in t)


@settings(max_examples=60, deadline=None)
@given(expr=st.one_of(numeric(3), boolean(2)))
def test_dual_render_and_oracle_agree(fuzz_env, expr):
    spark, con = fuzz_env
    p = scan("fuzz_t").select(col("x"), expr.alias("v"))
    df_rows = sorted(((_norm(a), _norm(b)) for a, b in p.to_df(spark).collect()), key=_key)
    sql_rows = sorted(
        ((_norm(a), _norm(b)) for a, b in spark.sql(p.to_sql("spark")).collect()),
        key=_key,
    )
    duck_rows = sorted(
        ((_norm(a), _norm(b)) for a, b in con.execute(p.to_sql("duckdb")).fetchall()),
        key=_key,
    )
    assert df_rows == sql_rows, f"DataFrame != SQL for {p.to_sql('spark')}"
    assert df_rows == duck_rows, (
        f"Spark != DuckDB\nspark sql: {p.to_sql('spark')}\n"
        f"duck sql:  {p.to_sql('duckdb')}\n{df_rows}\nvs\n{duck_rows}"
    )


# ---- round-4c: string-function tier (trim family, substring, strpos,
# concat) — the reader-surface registry entries under random nesting ----

def _fn(*a):
    from datafusion_sqlgen_spark.expressions import fn

    return fn(*a)


def _binop_concat(a, b):
    from datafusion_sqlgen_spark.expressions.core import BinOp

    return BinOp("||", a, b)


def str_leaf():
    return st.one_of(
        st.just(col("s")),
        st.sampled_from(["a", "Beta", " x ", "aa b", ""]).map(lit),
        st.just(lit(None)),
    )


def string_expr(depth: int):
    if depth <= 0:
        return str_leaf()
    sub = string_expr(depth - 1)
    chars = st.sampled_from(["a", "A", " ", "ab"]).map(lit)
    return st.one_of(
        str_leaf(),
        sub.map(lambda e: _fn("upper", e)),
        sub.map(lambda e: _fn("lower", e)),
        sub.map(lambda e: _fn("reverse", e)),
        sub.map(lambda e: _fn("trim", e)),
        st.tuples(sub, chars).map(lambda t: _fn("btrim", t[0], t[1])),
        st.tuples(sub, chars).map(lambda t: _fn("ltrim_chars", t[0], t[1])),
        st.tuples(sub, chars).map(lambda t: _fn("rtrim_chars", t[0], t[1])),
        # positive start only: 0/negative starts have engine-specific
        # semantics and are not emitted by the parser's standard form
        st.tuples(sub, st.integers(1, 4), st.integers(0, 3)).map(
            lambda t: _fn("substring", t[0], lit(t[1]), lit(t[2]))
        ),
        # || propagates NULL identically in both engines (concat() does
        # NOT: DuckDB skips NULLs — deliberately not fuzzed here)
        st.tuples(sub, sub).map(lambda t: _binop_concat(t[0], t[1])),
    )


@settings(max_examples=60, deadline=None)
@given(expr=string_expr(3))
def test_string_fns_dual_render_and_oracle(fuzz_env, expr):
    spark, con = fuzz_env
    p = scan("fuzz_t").select(col("x"), expr.alias("v"))
    df_rows = sorted(
        ((_norm(a), b) for a, b in p.to_df(spark).collect()), key=_key
    )
    sql_rows = sorted(
        ((_norm(a), b) for a, b in spark.sql(p.to_sql("spark")).collect()),
        key=_key,
    )
    duck_rows = sorted(
        ((_norm(a), b) for a, b in con.execute(p.to_sql("duckdb")).fetchall()),
        key=_key,
    )
    assert df_rows == sql_rows, f"DataFrame != SQL for {p.to_sql('spark')}"
    assert df_rows == duck_rows, (
        f"Spark != DuckDB\nspark sql: {p.to_sql('spark')}\n"
        f"duck sql:  {p.to_sql('duckdb')}\n{df_rows[:4]}\nvs\n{duck_rows[:4]}"
    )


@settings(max_examples=30, deadline=None)
@given(expr=string_expr(2))
def test_strpos_over_fuzzed_strings(fuzz_env, expr):
    """strpos (the parser's POSITION target) over nested string args."""
    spark, con = fuzz_env
    p = scan("fuzz_t").select(
        col("x"), _fn("strpos", expr, lit("a")).alias("v")
    )
    df_rows = sorted(
        ((_norm(a), _norm(b)) for a, b in p.to_df(spark).collect()), key=_key
    )
    duck_rows = sorted(
        ((_norm(a), _norm(b)) for a, b in con.execute(p.to_sql("duckdb")).fetchall()),
        key=_key,
    )
    assert df_rows == duck_rows, (
        f"Spark != DuckDB\nspark sql: {p.to_sql('spark')}\n"
        f"duck sql:  {p.to_sql('duckdb')}"
    )


# ---- round-4c: date/interval tier — arithmetic with month-end
# clamping, truncation, part extraction, datediff (the other
# divergence-prone family) ----

def _date_lit(s_iso: str):
    import datetime as dt

    return lit(dt.date.fromisoformat(s_iso))


def _interval(n, unit):
    from datafusion_sqlgen_spark.expressions.core import Interval

    return Interval(n, unit)


def date_expr(depth: int):
    leaves = st.sampled_from(
        ["2024-01-31", "2024-02-29", "2023-12-15", "2024-06-01"]
    ).map(_date_lit)
    if depth <= 0:
        return leaves
    sub = date_expr(depth - 1)
    iv = st.tuples(
        st.integers(-3, 3), st.sampled_from(["DAY", "MONTH", "YEAR"])
    ).map(lambda t: _interval(*t))
    return st.one_of(
        leaves,
        st.tuples(sub, iv).map(lambda t: t[0] + t[1]),
        st.tuples(sub, iv).map(lambda t: t[0] - t[1]),
        sub.map(lambda e: _fn("last_day", e)),
    )


@settings(max_examples=50, deadline=None)
@given(expr=date_expr(3))
def test_date_arithmetic_dual_render_and_oracle(fuzz_env, expr):
    """Date +/- interval chains (incl. month-end clamping), last_day."""
    spark, con = fuzz_env
    p = scan("fuzz_t").select(col("x"), expr.alias("d")).limit(1)
    df_rows = [tuple(r) for r in p.to_df(spark).collect()]
    sql_rows = [tuple(r) for r in spark.sql(p.to_sql("spark")).collect()]
    duck_rows = [tuple(r) for r in con.execute(p.to_sql("duckdb")).fetchall()]

    def norm(rows):
        import datetime as dt

        out = []
        for r in rows:
            out.append(tuple(
                v.date() if isinstance(v, dt.datetime) else v for v in r
            ))
        return out

    assert norm(df_rows) == norm(sql_rows), p.to_sql("spark")
    assert norm(df_rows) == norm(duck_rows), (
        f"\nspark: {p.to_sql('spark')}\nduck:  {p.to_sql('duckdb')}"
        f"\n{norm(df_rows)} vs {norm(duck_rows)}"
    )


@settings(max_examples=40, deadline=None)
@given(expr=date_expr(2),
       part=st.sampled_from(["year", "month", "day", "quarter"]))
def test_date_parts_dual_render_and_oracle(fuzz_env, expr, part):
    spark, con = fuzz_env
    p = scan("fuzz_t").select(_fn(part, expr).alias("v")).limit(1)
    a = [int(r[0]) for r in p.to_df(spark).collect()]
    b = [int(r[0]) for r in con.execute(p.to_sql("duckdb")).fetchall()]
    assert a == b, f"{part}:\n{p.to_sql('spark')}\n{p.to_sql('duckdb')}"

"""Regression tests for the round-2 ADVICE.md findings.

  1. Values rendered a fixed `_v` alias — two Values nodes in one FROM
     (join of two inline relations) collided. Now uses _fresh_alias().
  2. zip_with(duckdb) iterated only the FIRST array's length; Spark pads
     the shorter array with NULL up to the longer one.
  3. Join-strategy hints were emitted after DISTINCT
     (`SELECT DISTINCT /*+ ... */`) where Spark silently ignores them;
     Lateral._fold also dropped hints.
  4. exists/forall DuckDB rewrites via len(list_filter(...)) collapsed
     three-valued logic (NULL predicate results were dropped).
  5. string_agg required exactly 3 args; the 2-arg (value, sep) form
     died with IndexError.
"""

import pytest

from datafusion_sqlgen_spark.expressions import agg, col, fn, lam, lit
from datafusion_sqlgen_spark.plans import Values, scan
from tests.conftest import assert_plan_matches_oracle


# ---- 1. Values alias freshness -----------------------------------------


def test_two_values_nodes_get_distinct_aliases(spark, duck):
    left = Values(((lit(1), lit("a")), (lit(2), lit("b"))), ("k", "x"))
    right = Values(((lit(1), lit("p")), (lit(2), lit("q"))), ("kk", "y"))
    p = (
        left.join(right, on=col("k") == col("kk"))
        .select(col("k"), col("x"), col("y"))
        .sort(col("k").asc())
    )
    sql = p.to_sql("spark")
    # distinct derived-table aliases, and the render is deterministic
    assert sql.count("AS _v(") == 0
    assert sql == p.to_sql("spark")
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert rows == [(1, "a", "p"), (2, "b", "q")]


def test_values_computed_rows_df_path(spark, duck):
    """Values rows holding computed expressions must work on BOTH render
    paths (to_df used to raise NotImplementedError while to_sql rendered)."""
    p = Values(
        ((fn("upper", lit("ab")), lit(1) + lit(2)), (lit("CD"), lit(7))),
        ("s", "n"),
    ).sort(col("n").asc())
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert rows == [("AB", 3), ("CD", 7)]


# ---- 2. zip_with unequal-length padding --------------------------------


def test_zip_with_pads_shorter_array(spark, duck):
    p = scan("nation").select(
        col("n_nationkey"),
        fn(
            "zip_with",
            fn("array", lit(1), lit(2)),
            fn("array", lit(10), lit(20), lit(30)),
            lam(("a", "b"), col("a") + col("b")),
        ).alias("z"),
    ).filter(col("n_nationkey") == lit(0))
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert rows == [(0, (11, 22, None))]


def test_zip_with_longer_first_array(spark, duck):
    p = scan("nation").select(
        fn(
            "zip_with",
            fn("array", lit(1), lit(2), lit(3)),
            fn("array", lit(10)),
            lam(("a", "b"), col("a") + col("b")),
        ).alias("z"),
    ).limit(1)
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert rows == [((11, None, None),)]


# ---- 3. hint placement vs DISTINCT -------------------------------------


def test_hint_rendered_before_distinct(spark):
    p = (
        scan("nation")
        .join(
            scan("region"),
            on=col("n_regionkey") == col("r_regionkey"),
            hint="broadcast",
        )
        .select(col("r_name"))
        .distinct()
    )
    sql = p.to_sql("spark")
    assert "SELECT /*+ BROADCAST(region) */ DISTINCT" in sql
    # and Spark actually honors it: broadcast exchange in the plan
    plan_str = spark.sql(sql)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_str or "BroadcastExchange" in plan_str


def test_lateral_propagates_left_hints(spark):
    left = scan("nation").join(
        scan("region"),
        on=col("n_regionkey") == col("r_regionkey"),
        hint="broadcast",
    )
    sub = (
        scan("customer")
        .filter(col("c_nationkey") == col("nation.n_nationkey"))
        .select(agg("count", lit(1)).alias("n_cust"))
    )
    p = left.lateral(sub, "lc")
    sql = p.to_sql("spark")
    assert "/*+ BROADCAST(region) */" in sql


# ---- 4. exists / forall three-valued logic -----------------------------


@pytest.mark.parametrize(
    "name,arr,want",
    [
        ("exists", (lit(False), fn("nullif", lit(1), lit(1)) > lit(0)), None),
        ("exists", (lit(False), lit(True)), True),
        ("exists", (lit(False), lit(False)), False),
        ("forall", (lit(True), fn("nullif", lit(1), lit(1)) > lit(0)), None),
        ("forall", (lit(True), lit(True)), True),
        ("forall", (lit(True), lit(False), fn("nullif", lit(1), lit(1)) > lit(0)), False),
    ],
)
def test_exists_forall_null_elements(spark, duck, name, arr, want):
    p = scan("region").select(
        fn(name, fn("array", *arr), lam(("x",), col("x"))).alias("r")
    ).limit(1)
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert rows == [(want,)]


# ---- 5. string_agg 2-arg form ------------------------------------------


def test_string_agg_two_args(spark, duck):
    p = (
        scan("region")
        .group_by()
        .agg(agg("string_agg", col("r_name"), lit("|")).alias("names"))
    )
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert rows == [("AFRICA|AMERICA|ASIA|EUROPE|MIDDLE EAST",)]

"""Plan IR: dual-render + oracle equivalence on the driver's tables.

Each test asserts the triple invariant
    plan.to_df(spark) == spark.sql(plan.to_sql('spark'))
                      == duckdb(plan.to_sql('duckdb'))
— the executable strengthening of the reference's textual round-trip
(tests/select.rs:57-68 in /root/reference).
"""

import pytest

from datafusion_sqlgen_spark.expressions import col, fn, agg, lit, when
from datafusion_sqlgen_spark.plans import Scan, SetOp, With, scan
from tests.conftest import assert_plan_matches_oracle


def test_scan_project_filter(spark, duck):
    """The reference's first live test shape (it_works, tests/select.rs:71-85)."""
    p = (
        scan("customer")
        .filter(col("c_mktsegment") == "BUILDING")
        .select(col("c_custkey"), col("c_name"))
    )
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert len(rows) > 0


def test_projection_arith_alias_cast(spark, duck):
    """select_distinct_simple_4 shape (tests/select.rs:181-196)."""
    p = (
        scan("lineitem")
        .select(
            ((col("l_extendedprice") * (1 - col("l_discount"))).cast("double")).alias("rev"),
            col("l_orderkey"),
        )
        .filter(col("l_orderkey") < 100)
    )
    assert_plan_matches_oracle(spark, duck, p)


def test_distinct(spark, duck):
    p = scan("lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert 1 <= len(rows) <= 6


def test_sort_limit_offset(spark, duck):
    p = (
        scan("orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .sort(col("o_totalprice").desc(), col("o_orderkey").asc())
        .offset(5)
        .limit(10)
    )
    # note: Offset below Limit in plan = LIMIT 10 OFFSET 5
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert len(rows) == 10


def test_stacked_filters_and_merge(spark, duck):
    """The reference's flat-Select drops one of two stacked filters
    (SURVEY.md §2.4.6); we AND-merge."""
    p = (
        scan("lineitem")
        .filter(col("l_quantity") > 10)
        .filter(col("l_discount") < 0.05)
        .select(col("l_orderkey"), col("l_quantity"), col("l_discount"))
    )
    sql = p.to_sql("spark")
    assert "AND" in sql
    assert_plan_matches_oracle(spark, duck, p)


def test_stacked_projections_nest(spark, duck):
    """Inner projection must survive (reference overwrites it)."""
    p = (
        scan("customer")
        .select(col("c_custkey"), (col("c_acctbal") * 2).alias("bal2"))
        .select(col("bal2"))
    )
    assert_plan_matches_oracle(spark, duck, p)


def test_filter_above_project_nests(spark, duck):
    """WHERE can't see SELECT aliases -> must nest."""
    p = (
        scan("customer")
        .select(col("c_custkey"), (col("c_acctbal") * 2).alias("bal2"))
        .filter(col("bal2") > 5000)
    )
    assert_plan_matches_oracle(spark, duck, p)


def test_empty_relation(spark, duck):
    """SELECT without FROM (reference live test tests/select.rs:199-231)."""
    from datafusion_sqlgen_spark.expressions.core import IsDistinctFrom
    from datafusion_sqlgen_spark.plans import EmptyRelation

    p = EmptyRelation().select(
        IsDistinctFrom(lit(1), lit(None)).alias("a"),
        lit(1).eq_null_safe(lit(None)).alias("b"),
    )
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert rows == [(True, False)]


def test_aggregate_groupby(spark, duck):
    p = (
        scan("lineitem")
        .group_by(col("l_returnflag"), col("l_linestatus"))
        .agg(
            agg("sum", col("l_quantity")).alias("sum_qty"),
            agg("count").alias("cnt"),
            fn("round", agg("avg", col("l_discount")), lit(4)).alias("avg_disc"),
        )
    )
    assert_plan_matches_oracle(spark, duck, p, ndigits=2)


def test_aggregate_rollup(spark, duck):
    p = (
        scan("lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(agg("count").alias("cnt"))
    )
    assert_plan_matches_oracle(spark, duck, p)


def test_aggregate_cube(spark, duck):
    p = (
        scan("orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(agg("count").alias("cnt"))
    )
    assert_plan_matches_oracle(spark, duck, p)


def test_distinct_aggregate(spark, duck):
    p = (
        scan("orders")
        .group_by(col("o_orderstatus"))
        .agg(agg("count", col("o_custkey"), distinct=True).alias("n_cust"))
    )
    assert_plan_matches_oracle(spark, duck, p)


def test_having(spark, duck):
    """Filter above Aggregate renders as HAVING."""
    p = (
        scan("orders")
        .group_by(col("o_custkey"))
        .agg(agg("count").alias("n"))
        .filter(col("n") > 15)
    )
    sql = p.to_sql("spark")
    assert "HAVING" in sql
    assert_plan_matches_oracle(spark, duck, p)


def test_join_inner(spark, duck):
    p = (
        scan("customer")
        .join(scan("nation"), on=col("c_nationkey") == col("n_nationkey"), broadcast=True)
        .select(col("c_custkey"), col("n_name"))
    )
    assert_plan_matches_oracle(spark, duck, p)


def test_join_left_with_nulls(spark, duck):
    p = (
        scan("nation")
        .join(scan("supplier"), on=col("n_nationkey") == col("s_nationkey"), how="left")
        .select(col("n_name"), col("s_name"))
    )
    assert_plan_matches_oracle(spark, duck, p)


def test_join_semi_anti(spark, duck):
    semi = (
        scan("customer")
        .join(
            scan("orders"),
            on=col("c_custkey") == col("o_custkey"),
            how="left_semi",
        )
        .select(col("c_custkey"))
    )
    assert_plan_matches_oracle(spark, duck, semi)
    anti = (
        scan("customer")
        .join(
            scan("orders"),
            on=col("c_custkey") == col("o_custkey"),
            how="left_anti",
        )
        .select(col("c_custkey"))
    )
    assert_plan_matches_oracle(spark, duck, anti)


def test_three_way_join_agg(spark, duck):
    p = (
        scan("customer")
        .join(scan("orders"), on=col("c_custkey") == col("o_custkey"))
        .join(scan("nation"), on=col("c_nationkey") == col("n_nationkey"), broadcast=True)
        .group_by(col("n_name"))
        .agg(fn("round", agg("sum", col("o_totalprice")), lit(2)).alias("revenue"))
    )
    assert_plan_matches_oracle(spark, duck, p, ndigits=2)


def test_union_all_and_distinct(spark, duck):
    a = scan("customer").select(col("c_nationkey").alias("nk"))
    b = scan("supplier").select(col("s_nationkey").alias("nk"))
    assert_plan_matches_oracle(spark, duck, SetOp(a, b, "union_all"))
    assert_plan_matches_oracle(spark, duck, SetOp(a, b, "union"))


def test_intersect_except(spark, duck):
    a = scan("customer").select(col("c_nationkey").alias("nk")).distinct()
    b = scan("supplier").select(col("s_nationkey").alias("nk")).distinct()
    assert_plan_matches_oracle(spark, duck, SetOp(a, b, "intersect"))
    assert_plan_matches_oracle(spark, duck, SetOp(a, b, "except"))


def test_cte(spark, duck):
    rev = (
        scan("orders")
        .group_by(col("o_custkey"))
        .agg(fn("round", agg("sum", col("o_totalprice")), lit(2)).alias("total"))
    )
    p = With(
        (("cust_rev", rev),),
        scan("cust_rev").filter(col("total") > 100000).select(col("o_custkey"), col("total")),
    )
    sql = p.to_sql("spark")
    assert sql.startswith("WITH cust_rev AS")
    assert_plan_matches_oracle(spark, duck, p, ndigits=2)


def test_window_over_plan(spark, duck):
    p = scan("orders").select(
        col("o_orderkey"),
        col("o_custkey"),
        fn("row_number")
        .over(
            partition_by=[col("o_custkey")],
            order_by=[col("o_totalprice").desc(), col("o_orderkey").asc()],
        )
        .alias("rn"),
    )
    assert_plan_matches_oracle(spark, duck, p)


def test_window_running_sum_frame(spark, duck):
    p = scan("events").select(
        col("event_id"),
        fn("round",
            agg("sum", col("value")).over(
                partition_by=[col("user_id")],
                order_by=[col("ts").asc(), col("event_id").asc()],
                rows_between=("unbounded", 0),
            ), lit(2))
        .alias("running_value"),
    )
    assert_plan_matches_oracle(spark, duck, p, ndigits=1)


def test_case_when_in_list(spark, duck):
    p = scan("orders").select(
        col("o_orderkey"),
        when(col("o_orderstatus") == "F", "finished")
        .when(col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_label"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_hot"),
    )
    assert_plan_matches_oracle(spark, duck, p)


def test_exists_subquery_sql_and_semi_join_df(spark, duck):
    """EXISTS renders in SQL on both dialects; the DataFrame path is the
    equivalent semi-join (what Catalyst decorrelates EXISTS into)."""
    from datafusion_sqlgen_spark.expressions.core import Exists

    sub = scan("orders").filter(col("o_custkey") == col("c_custkey")).select(lit(1))
    p_sql = scan("customer").filter(Exists(sub)).select(col("c_custkey"))
    rows_spark = spark.sql(p_sql.to_sql("spark")).collect()
    rows_duck = duck.execute(p_sql.to_sql("duckdb")).fetchall()
    assert sorted(r[0] for r in rows_spark) == sorted(r[0] for r in rows_duck)


def test_scalar_funcs(spark, duck):
    p = scan("part").select(
        fn("lower", col("p_name")).alias("lname"),
        fn("length", col("p_name")).cast("int").alias("name_len"),
        fn("substr", col("p_brand"), lit(1), lit(5)).alias("brand5"),
        fn("concat", col("p_brand"), lit("/"), col("p_type")).alias("bt"),
        fn("abs", col("p_retailprice") * -1).alias("absprice"),
    )
    assert_plan_matches_oracle(spark, duck, p)


def test_array_index_on_embeddings(spark, duck):
    p = (
        scan("embeddings")
        .select(col("vec_id"), col("embedding")[1].alias("first_dim"))
        .filter(col("vec_id") < 50)
    )
    assert_plan_matches_oracle(spark, duck, p)


def test_date_trunc_group(spark, duck):
    p = (
        scan("orders")
        .group_by(fn("date_trunc", lit("month"), col("o_orderdate")).alias("month"))
        .agg(agg("count").alias("n_orders"))
    )
    assert_plan_matches_oracle(spark, duck, p)


def test_recursive_with_series(spark, duck):
    from datafusion_sqlgen_spark.expressions import Interval
    from datafusion_sqlgen_spark.plans import EmptyRelation, RecursiveWith

    p = RecursiveWith(
        name="series",
        columns=("n",),
        base=EmptyRelation().select(lit(1).alias("n")),
        step=scan("series").filter(col("n") < 6).select((col("n") + 1).alias("n")),
        body=scan("series").sort(col("n").asc()),
    )
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert [r[0] for r in rows] == [1, 2, 3, 4, 5, 6]


def test_recursive_with_as_derived_table(spark, duck):
    """RecursiveWith folds into a derived table for parent operators."""
    from datafusion_sqlgen_spark.plans import EmptyRelation, RecursiveWith

    series = RecursiveWith(
        name="s2",
        columns=("n",),
        base=EmptyRelation().select(lit(1).alias("n")),
        step=scan("s2").filter(col("n") < 10).select((col("n") + 1).alias("n")),
        body=scan("s2"),
    )
    p = series.filter(col("n") % 2 == 0).group_by().agg(agg("sum", col("n")).alias("s"))
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert rows == [(30,)]


def test_values_relation_joins_as_lookup(spark, duck):
    """Inline VALUES as a broadcast lookup table joined to a real table."""
    from datafusion_sqlgen_spark.plans import Values

    lookup = Values(
        rows=(("BUILDING", "b2b"), ("MACHINERY", "b2b"), ("AUTOMOBILE", "b2c")),
        columns=("seg", "channel"),
    )
    p = (
        scan("customer")
        .join(lookup, on=col("c_mktsegment") == col("seg"))
        .group_by(col("channel"))
        .agg(agg("count").alias("n"))
        .sort(col("channel").asc())
    )
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert len(rows) == 2


def test_values_standalone(spark, duck):
    from datafusion_sqlgen_spark.plans import Values

    p = Values(rows=((1, "a"), (2, "b"), (None, "c")), columns=("n", "s")) \
        .filter(col("n").is_not_null()).sort(col("n").asc())
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert rows == [(1, "a"), (2, "b")]


def test_to_sql_deterministic():
    """Textual round-trip identity (the reference's invariant,
    tests/select.rs:57-68): rendering the same plan twice yields
    byte-identical SQL, including derived-table alias numbering."""
    p = (
        scan("customer")
        .select(col("c_custkey"), col("c_acctbal"))
        .filter(col("c_acctbal") > 0)
        .select(col("c_custkey"))
        .union(scan("nation").select(col("n_nationkey")))
        .filter(col("c_custkey") < 10)
    )
    assert p.to_sql("spark") == p.to_sql("spark")
    assert p.to_sql("duckdb") == p.to_sql("duckdb")


def test_unpivot_drops_null_measures_on_both_paths(spark):
    from datafusion_sqlgen_spark.plans import Values

    v = Values(
        rows=((1, 10.0, None), (2, None, 5.0)),
        columns=("id", "a", "b"),
    )
    p = v.unpivot(["id"], ["a", "b"], var_col="k", value_col="v") \
         .sort(col("id").asc(), col("k").asc())
    # SQL UNPIVOT excludes NULL measures; the DataFrame path must agree
    got_df = [tuple(r) for r in p.to_df(spark).collect()]
    got_sql = [tuple(r) for r in spark.sql(p.to_sql("spark")).collect()]
    assert got_df == got_sql == [(1, "a", 10.0), (2, "b", 5.0)]


def test_unpivot_does_not_leak_undeclared_ids(spark):
    from datafusion_sqlgen_spark.plans import Values

    v = Values(
        rows=((1, "x", 1.0, 2.0),),
        columns=("id", "extra", "a", "b"),
    )
    p = v.unpivot(["id"], ["a", "b"])
    assert set(p.to_df(spark).columns) == {"id", "key", "val"}
    assert set(spark.sql(p.to_sql("spark")).columns) == {"id", "key", "val"}


def test_lateral_correlated_topn(spark, duck):
    from tests.conftest import assert_plan_matches_oracle

    sub = (
        scan("orders")
        .filter(col("o_custkey") == col("customer.c_custkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .sort(col("o_totalprice").desc(), col("o_orderkey").asc())
        .limit(1)
    )
    p = (
        scan("customer")
        .filter(col("c_custkey") < 40)
        .alias("customer")
        .lateral(sub, "top_o")
        .select(col("c_custkey"), col("top_o.o_orderkey"))
        .sort(col("c_custkey").asc())
    )
    rows = assert_plan_matches_oracle(spark, duck, p)
    assert len(rows) > 10

"""Property-based plan fuzzing: random operator chains must dual-render
identically (to_df == spark.sql(to_sql)) and match DuckDB.

Directly targets the reference's flat-Select accumulator defect
(SURVEY.md §2.4.6: stacked same-kind nodes overwrite each other there) —
our generator must nest sub-SELECTs whenever slots collide, for ANY
stacking order the strategy produces.
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from datafusion_sqlgen_spark.expressions import col, lit
from datafusion_sqlgen_spark.plans import scan

ROWS = [(i, (i * 7919) % 23 - 11, f"s{i % 5}") for i in range(40)]
ROWS += [(100, None, None), (101, None, "s0")]


@pytest.fixture(scope="module")
def plan_env(spark):
    # explicit schema: createDataFrame(pandas Int64) turns None into a
    # DOUBLE NaN on the Spark side while DuckDB keeps a BIGINT NULL —
    # the engines would then legitimately disagree (SQL UNPIVOT drops
    # NULLs but keeps NaN) and NaN != NaN breaks the sorted() compare.
    pdf = pd.DataFrame(ROWS, columns=["a", "b", "s"]).astype({"b": "Int64"})
    spark.createDataFrame(ROWS, "a bigint, b bigint, s string") \
        .createOrReplaceTempView("fuzz_p")
    con = duckdb.connect()
    con.register("fuzz_p", pdf)
    return spark, con


# each op is (callable(plan) -> plan); chains stack them on a scan.
def _ops():
    return st.one_of(
        st.integers(-11, 12).map(lambda v: lambda p: p.filter(col("b") > v)),
        st.integers(0, 101).map(lambda v: lambda p: p.filter(col("a") <= v)),
        st.just(lambda p: p.filter(col("b").is_not_null())),
        st.just(lambda p: p.select(col("a"), col("b"), col("s"))),
        st.just(lambda p: p.select(col("a"), (col("b") * 2).alias("b"), col("s"))),
        st.just(lambda p: p.distinct()),
        # sorts before LIMIT/OFFSET must be a TOTAL order over the output
        # columns (a, b, s): ops like unpivot can make `a` non-unique, and
        # ties at the LIMIT boundary would legitimately differ across
        # engines (under-determined query, not a bug).
        st.integers(1, 30).map(
            lambda n: lambda p: p.sort(
                col("a").asc(), col("b").desc(nulls_first=False), col("s").asc()
            ).limit(n)
        ),
        st.integers(0, 5).map(
            lambda k: lambda p: p.sort(
                col("a").desc(), col("b").asc(), col("s").asc()
            ).offset(k).limit(10)
        ),
    )


def _key(t):
    return tuple((v is None, v if v is not None else 0) for v in t)


@settings(max_examples=40, deadline=None)
@given(chain=st.lists(_ops(), min_size=1, max_size=5))
def test_stacked_plans_dual_render(plan_env, chain):
    spark, con = plan_env
    p = scan("fuzz_p")
    for op in chain:
        p = op(p)
    # limit/offset make row SETS order-dependent: wrap in a final sort to
    # compare sets only when the chain didn't already bound rows; here we
    # compare multisets, which is exact because limits follow sorts with
    # a unique leading key (a).
    df_rows = sorted((tuple(r) for r in p.to_df(spark).collect()), key=_key)
    sql = p.to_sql("spark")
    sql_rows = sorted((tuple(r) for r in spark.sql(sql).collect()), key=_key)
    duck_rows = sorted(
        (tuple(r) for r in con.execute(p.to_sql("duckdb")).fetchall()), key=_key
    )
    assert df_rows == sql_rows, f"DataFrame != spark.sql\n{sql}"
    assert df_rows == duck_rows, (
        f"Spark != DuckDB\nspark: {sql}\nduck: {p.to_sql('duckdb')}"
    )


# round-2 ops: offset without limit, set-ops (parenthesization), explode
def _ops_r2():
    base = scan("fuzz_p").select(col("a"), col("b"), col("s"))
    return st.one_of(
        _ops(),
        st.integers(0, 8).map(
            lambda k: lambda p: p.sort(
                col("a").asc(), col("b").asc(), col("s").asc()
            ).offset(k)
        ),
        st.just(lambda p: p.union(base)),
        st.just(
            lambda p: p.select(col("a"), col("b"), col("s")).intersect(base)
        ),
    )


@settings(max_examples=40, deadline=None)
@given(chain=st.lists(_ops_r2(), min_size=1, max_size=4))
def test_stacked_plans_r2_dual_render(plan_env, chain):
    spark, con = plan_env
    p = scan("fuzz_p")
    for op in chain:
        p = op(p)
    df_rows = sorted((tuple(r) for r in p.to_df(spark).collect()), key=_key)
    sql = p.to_sql("spark")
    sql_rows = sorted((tuple(r) for r in spark.sql(sql).collect()), key=_key)
    duck_rows = sorted(
        (tuple(r) for r in con.execute(p.to_sql("duckdb")).fetchall()), key=_key
    )
    assert df_rows == sql_rows, f"DataFrame != spark.sql\n{sql}"
    assert df_rows == duck_rows, (
        f"Spark != DuckDB\nspark: {sql}\nduck: {p.to_sql('duckdb')}"
    )


# round-3/4 ops: unpivot (schema-restoring), uncorrelated lateral, and
# USING self-join — the nodes whose folds splice the FROM clause
def _ops_r3():
    from datafusion_sqlgen_spark.plans import EmptyRelation

    one = EmptyRelation().select(lit(1).alias("one"))
    # distinct key relation: USING (a) merges the join column, so the
    # (a, b, s) schema survives and left-row multiplicity is preserved
    akeys = scan("fuzz_p").select(col("a")).distinct()
    return st.one_of(
        _ops(),
        # wide->long->restore: exercises Unpivot under arbitrary stacking
        st.just(
            lambda p: p.select(col("a"), col("b"), col("s"))
            .unpivot(["s"], ["a", "b"], var_col="k", value_col="v")
            .select(col("v").alias("a"), col("v").alias("b"),
                    col("k").alias("s"))
        ),
        # FROM p, LATERAL (SELECT 1) — comma fragment under stacking
        st.just(
            lambda p: p.lateral(one, "lx")
            .select(col("a"), col("b"), col("s"))
        ),
        # round-4 USING join: renders `USING (a)`, which the parse-
        # roundtrip test below must re-parse to the same merged-column IR
        st.just(
            lambda p: p.select(col("a"), col("b"), col("s"))
            .join(akeys, using=("a",))
        ),
        # round-4c star-except: add a helper column, then drop it via
        # `* EXCEPT (t2)` (Spark) / `* EXCLUDE (t2)` (DuckDB) — schema
        # restores to (a, b, s); the parse roundtrip must re-parse the
        # except-list into the same Star IR
        st.just(
            lambda p: p.select(
                col("a"), col("b"), col("s"),
                (col("a") + col("a")).alias("t2"),
            ).select(_star_except("t2"))
        ),
    )


def _star_except(*cols):
    from datafusion_sqlgen_spark.expressions.core import Star

    return Star(None, tuple(cols))


def _ops_r10():
    """Round-10 surface under arbitrary stacking: SIMILAR TO filters,
    generate_series spine joins, ordered array_agg — each op restores
    the (a, b, s) schema so chains compose."""
    from datafusion_sqlgen_spark.expressions import agg, fn
    from datafusion_sqlgen_spark.expressions.core import SimilarTo
    from datafusion_sqlgen_spark.plans.core import GenerateSeries

    series = GenerateSeries((0, 3), table_alias="g")
    return st.one_of(
        _ops_r3(),
        # SIMILAR TO filter (shared compiled regex on both renders)
        st.just(lambda p: p.filter(SimilarTo(col("s"), "s[0-2]"))),
        st.just(
            lambda p: p.filter(SimilarTo(col("s"), "s%", negated=True))
        ),
        # series spine equi join; schema restored by re-projection
        st.just(
            lambda p: p.join(
                series, on=col("a") % 4 == col("generate_series"),
                how="left",
            ).select(col("a"), col("b"), col("s"))
        ),
        # ordered array_agg re-spread: group by s, keep one row per
        # group with a deterministic (key, value)-sorted join string
        st.just(
            lambda p: p.group_by(col("s")).agg(
                agg("min", col("a")).alias("a"),
                agg("max", col("b")).alias("b"),
                fn(
                    "array_join",
                    agg("array_agg", col("s"), col("a")),
                    lit("_"),
                ).alias("s"),
            ).select(col("a"), col("b"), col("s"))
        ),
    )


@settings(max_examples=40, deadline=None)
@given(chain=st.lists(_ops_r10(), min_size=1, max_size=4))
def test_stacked_plans_r10_parse_roundtrip(plan_env, chain):
    """The round-10 surface must survive arbitrary stacking exactly like
    _ops_r3: render→parse→render fixpoint + identical DuckDB results."""
    from datafusion_sqlgen_spark.parser import parse_sql

    spark, con = plan_env
    p = scan("fuzz_p")
    for op in chain:
        p = op(p)
    sql = p.to_sql("spark")
    rp = parse_sql(sql)
    s2 = rp.to_sql("spark")
    assert parse_sql(s2).to_sql("spark") == s2, f"not a fixpoint:\n{s2}"
    orig = sorted((tuple(r) for r in con.execute(p.to_sql("duckdb")).fetchall()),
                  key=_key)
    back = sorted((tuple(r) for r in con.execute(rp.to_sql("duckdb")).fetchall()),
                  key=_key)
    assert orig == back, (
        f"reparse changed results\nspark: {sql}\nduck orig: {p.to_sql('duckdb')}"
        f"\nduck back: {rp.to_sql('duckdb')}"
    )


@settings(max_examples=60, deadline=None)
@given(chain=st.lists(_ops_r3(), min_size=1, max_size=4))
def test_stacked_plans_parse_roundtrip(plan_env, chain):
    """Round 4: the SQL front end must survive ARBITRARY operator
    stackings, not just the curated catalog — every fuzzed plan's Spark
    render re-parses to a plan that (a) renders to a parse fixpoint and
    (b) returns identical DuckDB results to the original. DuckDB-only
    execution keeps the property cheap enough to fuzz."""
    from datafusion_sqlgen_spark.parser import parse_sql

    spark, con = plan_env
    p = scan("fuzz_p")
    for op in chain:
        p = op(p)
    sql = p.to_sql("spark")
    rp = parse_sql(sql)
    s2 = rp.to_sql("spark")
    assert parse_sql(s2).to_sql("spark") == s2, f"not a fixpoint:\n{s2}"
    orig = sorted((tuple(r) for r in con.execute(p.to_sql("duckdb")).fetchall()),
                  key=_key)
    back = sorted((tuple(r) for r in con.execute(rp.to_sql("duckdb")).fetchall()),
                  key=_key)
    assert orig == back, (
        f"reparse changed results\nspark: {sql}\nduck orig: {p.to_sql('duckdb')}"
        f"\nduck back: {rp.to_sql('duckdb')}"
    )


@settings(max_examples=30, deadline=None)
@given(chain=st.lists(_ops_r3(), min_size=1, max_size=4))
def test_stacked_plans_r3_dual_render(plan_env, chain):
    spark, con = plan_env
    p = scan("fuzz_p")
    for op in chain:
        p = op(p)
    df_rows = sorted((tuple(r) for r in p.to_df(spark).collect()), key=_key)
    sql = p.to_sql("spark")
    sql_rows = sorted((tuple(r) for r in spark.sql(sql).collect()), key=_key)
    duck_rows = sorted(
        (tuple(r) for r in con.execute(p.to_sql("duckdb")).fetchall()), key=_key
    )
    assert df_rows == sql_rows, f"DataFrame != spark.sql\n{sql}"
    assert df_rows == duck_rows, (
        f"Spark != DuckDB\nspark: {sql}\nduck: {p.to_sql('duckdb')}"
    )


def test_intersect_after_offset_dedups(plan_env):
    """Regression: Spark 4.1's AQE replan of a distinct INTERSECT whose
    left branch carries LIMIT+OFFSET (TakeOrderedAndProject with offset)
    drops the final distinct aggregate of the semi-join rewrite — left
    duplicates leaked through on BOTH the DataFrame and the SQL path
    (found by test_stacked_plans_r2_dual_render). The SetOp node now
    pre-distincts the left operand (semantically free for distinct
    INTERSECT/EXCEPT), which keeps the output distinct by join shape
    even when AQE loses the aggregate."""
    spark, con = plan_env
    base = scan("fuzz_p").select(col("a"), col("b"), col("s"))
    p = (
        scan("fuzz_p")
        .union(base)
        .sort(col("a").desc(), col("b").asc(), col("s").asc())
        .offset(1)
        .limit(10)
        .select(col("a"), col("b"), col("s"))
        .intersect(base)
    )
    for rows in (
        [tuple(r) for r in p.to_df(spark).collect()],
        [tuple(r) for r in spark.sql(p.to_sql("spark")).collect()],
    ):
        assert len(rows) == len(set(rows)), "INTERSECT leaked duplicates"
    duck = sorted(
        (tuple(r) for r in con.execute(p.to_sql("duckdb")).fetchall()),
        key=_key,
    )
    assert sorted((tuple(r) for r in p.to_df(spark).collect()), key=_key) == duck


def test_except_after_offset_dedups(plan_env):
    """Same Spark AQE bug class for EXCEPT: the anti-join rewrite's
    final distinct is equally at risk, and pre-distincting the left
    operand is equally free."""
    spark, con = plan_env
    base = scan("fuzz_p").select(col("a"), col("b"), col("s"))
    p = (
        scan("fuzz_p")
        .union(base)
        .sort(col("a").desc(), col("b").asc(), col("s").asc())
        .offset(1)
        .limit(10)
        .select(col("a"), col("b"), col("s"))
        .except_(base.filter(col("a") < lit(38)))
    )
    df_rows = sorted((tuple(r) for r in p.to_df(spark).collect()), key=_key)
    assert len(df_rows) == len(set(df_rows))
    duck = sorted(
        (tuple(r) for r in con.execute(p.to_sql("duckdb")).fetchall()),
        key=_key,
    )
    assert df_rows == duck

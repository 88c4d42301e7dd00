"""Round-4c parser widening: SQL-standard reader-side forms a reference
user writes by hand but the repo's renderer never emits — keyword-form
function calls (EXTRACT / SUBSTRING FROM / TRIM spec / POSITION IN),
operand-form CASE, quoted INTERVAL quantities, IS [NOT] TRUE/FALSE/
UNKNOWN, BETWEEN SYMMETRIC, quantified = ANY / <> ALL, ORDER BY ALL,
star-except projections and DISTINCT ON.

Every case asserts the full dual-engine contract: the parsed plan's
DataFrame result == spark.sql(spark render) == DuckDB(duckdb render),
plus the one-render fixpoint in both dialects. Reference intent: the
text->plan entry direction at tests/select.rs:57-68 (DFParser covers the
full SQL-standard expression grammar, so these forms parse in the
reference's front end even though its renderer never produces them).
"""

import pytest

from datafusion_sqlgen_spark.parser import ParseError, parse_sql
from tests.conftest import assert_plan_matches_oracle

CASES = {
    "case_operand": (
        "SELECT c_custkey, CASE c_mktsegment WHEN 'BUILDING' THEN 1 "
        "WHEN 'AUTOMOBILE' THEN 2 ELSE 0 END AS seg FROM customer "
        "ORDER BY c_custkey LIMIT 50"
    ),
    "extract_parts": (
        "SELECT o_orderkey, EXTRACT(YEAR FROM o_orderdate) AS y, "
        "EXTRACT(MONTH FROM o_orderdate) AS m, "
        "EXTRACT(QUARTER FROM o_orderdate) AS q, "
        "EXTRACT(DOY FROM o_orderdate) AS doy FROM orders "
        "ORDER BY o_orderkey LIMIT 40"
    ),
    "substring_from_for": (
        "SELECT c_custkey, SUBSTRING(c_name FROM 1 FOR 8) AS pre, "
        "SUBSTRING(c_mktsegment FROM 4) AS tail FROM customer "
        "ORDER BY c_custkey LIMIT 30"
    ),
    "trim_specs": (
        "SELECT c_custkey, TRIM(BOTH 'C' FROM c_name) AS b, "
        "TRIM(LEADING 'C' FROM c_name) AS l, "
        "TRIM(TRAILING '0123456789' FROM c_name) AS t, "
        "TRIM(c_mktsegment) AS plain FROM customer ORDER BY c_custkey LIMIT 30"
    ),
    "position_in": (
        "SELECT c_custkey, POSITION('Customer' IN c_name) AS p1, "
        "POSITION('9' IN c_name) AS p2 FROM customer "
        "ORDER BY c_custkey LIMIT 30"
    ),
    "interval_quoted": (
        "SELECT o_orderkey, o_orderdate + INTERVAL '1' DAY AS nxt "
        "FROM orders ORDER BY o_orderkey LIMIT 20"
    ),
    "is_bool_tests": (
        "SELECT c_custkey, (c_acctbal > 0) IS TRUE AS pos, "
        "(c_acctbal > 0) IS NOT TRUE AS npos, "
        "(NULLIF(c_acctbal, c_acctbal) > 0) IS UNKNOWN AS unk "
        "FROM customer ORDER BY c_custkey LIMIT 30"
    ),
    "between_symmetric": (
        "SELECT c_custkey FROM customer "
        "WHERE c_acctbal BETWEEN SYMMETRIC 1000 AND 0 "
        "ORDER BY c_custkey LIMIT 30"
    ),
    "quantified_any": (
        "SELECT n_name FROM nation "
        "WHERE n_nationkey = ANY (SELECT c_nationkey FROM customer) "
        "ORDER BY n_name"
    ),
    "quantified_all_ne": (
        "SELECT n_name FROM nation "
        "WHERE n_nationkey <> ALL (SELECT c_nationkey FROM customer "
        "WHERE c_acctbal > 9000) ORDER BY n_name"
    ),
    "order_by_all": (
        "SELECT c_nationkey, count(*) AS n FROM customer "
        "GROUP BY ALL ORDER BY ALL"
    ),
    "order_by_all_desc": (
        "SELECT c_mktsegment, c_nationkey, count(*) AS n FROM customer "
        "GROUP BY c_mktsegment, c_nationkey ORDER BY ALL DESC LIMIT 25"
    ),
    "star_except": (
        "SELECT * EXCEPT (n_regionkey) FROM nation ORDER BY n_nationkey"
    ),
    "star_exclude_duckdb_spelling": (
        "SELECT * EXCLUDE (n_name, n_regionkey) FROM nation "
        "ORDER BY n_nationkey"
    ),
    "distinct_on": (
        "SELECT DISTINCT ON (c_nationkey) c_nationkey, c_name, c_acctbal "
        "FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey"
    ),
    "distinct_on_no_order": (
        # no ORDER BY: one row per key, keyed deterministically by the ON
        # key itself; project a key-determined column so the row content
        # is stable
        "SELECT DISTINCT ON (c_nationkey) c_nationkey FROM customer"
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_reader_surface_oracle(name, spark, duck):
    plan = parse_sql(CASES[name])
    assert_plan_matches_oracle(spark, duck, plan)


@pytest.mark.parametrize("name", sorted(CASES))
def test_reader_surface_fixpoint(name):
    plan = parse_sql(CASES[name])
    for dialect in ("spark", "duckdb"):
        s1 = plan.to_sql(dialect)
        s2 = parse_sql(s1).to_sql(dialect)
        assert s1 == s2, f"{dialect} fixpoint broken:\n{s1}\n{s2}"


def test_distinct_on_picks_max_row(spark, duck):
    """Value-level spot check: DISTINCT ON + ORDER BY key, bal DESC
    keeps each nation's max-balance customer (ties broken by custkey)."""
    plan = parse_sql(
        "SELECT DISTINCT ON (c_nationkey) c_nationkey, c_acctbal "
        "FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey"
    )
    got = {r[0]: r[1] for r in plan.to_df(spark).collect()}
    want = {
        r[0]: r[1]
        for r in duck.execute(
            "SELECT c_nationkey, max(c_acctbal) FROM customer "
            "GROUP BY c_nationkey"
        ).fetchall()
    }
    assert got == want


def test_ordered_quantified_comparison_desugars():
    """Round 5: > ALL no longer raises — it desugars to a max scalar
    subquery (the r4-era ParseError covered only = ANY / <> ALL)."""
    p = parse_sql(
        "SELECT 1 AS x FROM nation "
        "WHERE n_nationkey > ALL (SELECT c_nationkey FROM customer)"
    )
    sql = p.to_sql("spark")
    assert "max(" in sql and "ALL" not in sql
    # the unnamable-column form still raises, with actionable wording
    with pytest.raises(ParseError, match="alias"):
        parse_sql(
            "SELECT 1 AS x FROM nation "
            "WHERE n_nationkey > ALL (SELECT c_nationkey + 1 FROM customer)"
        )


def test_case_operand_desugars_to_searched():
    p = parse_sql(
        "SELECT CASE c_mktsegment WHEN 'A' THEN 1 ELSE 0 END AS f "
        "FROM customer"
    )
    sql = p.to_sql("spark")
    assert "WHEN (c_mktsegment = 'A')" in sql


def test_order_by_all_star_rejected():
    with pytest.raises(ParseError, match="ORDER BY ALL"):
        parse_sql("SELECT * FROM nation ORDER BY ALL")


def test_fetch_first_parses_to_limit(spark, duck):
    plan = parse_sql(
        "SELECT n_name FROM nation ORDER BY n_name ASC NULLS FIRST "
        "OFFSET 2 ROWS FETCH NEXT 3 ROWS ONLY"
    )
    assert "LIMIT 3" in plan.to_sql("spark")
    assert_plan_matches_oracle(spark, duck, plan)

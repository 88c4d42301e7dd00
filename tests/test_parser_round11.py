"""Round-11 SQL-surface batch: implicit comma cross-joins (SQL-92,
VERDICT r10 missing #1), the AsofJoin node rework gates living in
test_parser_round10b.py, and (later in the round) PG regex operator
spellings and multi-index array access.

Verification pattern per the house style: render→parse→render fixpoint,
DuckDB equivalence on an independent formulation, Spark dual-render,
and physical-plan gates.
"""

import duckdb
import pytest

from datafusion_sqlgen_spark.parser import ParseError, parse_sql
from tests.conftest import normalize_rows


def _fixpoint(sql: str) -> str:
    s = parse_sql(sql).to_sql("spark")
    assert parse_sql(s).to_sql("spark") == s, s
    return s


# ---------------------------------------------------------------------------
# Implicit comma cross-join: FROM a, b [WHERE ...]
# ---------------------------------------------------------------------------

def test_comma_join_parses_and_fixpoints_as_cross_join():
    s = _fixpoint("SELECT a.x, b.y FROM a, b WHERE a.x = b.y")
    assert "CROSS JOIN" in s
    d = parse_sql("SELECT a.x, b.y FROM a, b WHERE a.x = b.y").to_sql(
        "duckdb")
    assert "CROSS JOIN" in d


def test_comma_join_three_way_left_folds():
    s = _fixpoint("SELECT 1 AS one FROM a, b, c")
    assert s.count("CROSS JOIN") == 2


def test_comma_join_reference_corpus_shape():
    """The reference's csv_join_unaliased_subqueries intent
    (tests/select.rs:817-837): comma-separated parenthesized
    subqueries in FROM, equality predicate in WHERE."""
    s = _fixpoint(
        "SELECT a.c1, b.c2 FROM (SELECT c_custkey AS c1 FROM customer) "
        "AS a, (SELECT o_custkey AS c2 FROM orders) AS b "
        "WHERE a.c1 = b.c2"
    )
    assert "CROSS JOIN" in s


def test_comma_join_mixes_with_explicit_joins():
    # comma then JOIN: left-folded; equivalent for inner conditions
    s = _fixpoint(
        "SELECT 1 AS one FROM a, b JOIN c ON b.x = c.x WHERE a.y = b.y")
    assert "CROSS JOIN" in s and " JOIN c ON" in s


def test_comma_join_trailing_comma_rejects():
    with pytest.raises(ParseError):
        parse_sql("SELECT 1 FROM a, WHERE x = 1")


def test_comma_join_matches_duckdb_and_explicit_join(spark):
    q = ("SELECT c.c_mktsegment, count(*) AS n FROM customer AS c, "
         "orders AS o WHERE c.c_custkey = o.o_custkey "
         "GROUP BY c.c_mktsegment")
    plan = parse_sql(q)
    mine = normalize_rows(plan.to_df(spark).collect())
    via_sql = normalize_rows(spark.sql(plan.to_sql("spark")).collect())
    assert mine == via_sql
    explicit = parse_sql(
        "SELECT c.c_mktsegment, count(*) AS n FROM customer AS c "
        "JOIN orders AS o ON c.c_custkey = o.o_custkey "
        "GROUP BY c.c_mktsegment")
    assert mine == normalize_rows(explicit.to_df(spark).collect())
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")
    assert mine == normalize_rows(con.execute(q).fetchall())


def test_comma_join_with_equality_plans_as_hash_join(spark):
    """Catalyst's ExtractFiltersAndInnerJoins must fold the WHERE
    equality into the join condition — a comma join with keys is a
    hash equi-join, never a cartesian (the 100-TB property; without
    it the comma spelling would be a scale trap)."""
    q = ("SELECT c.c_name, o.o_orderkey FROM customer AS c, orders AS o "
         "WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000")
    df = parse_sql(q).to_df(spark)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys
    assert "HashJoin" in phys


def test_comma_join_keyless_is_honest_cartesian(spark):
    """With no predicate the comma join IS a cross product — it must
    execute (tiny dims are legitimate), not error."""
    q = "SELECT r.r_name, n.n_name FROM region AS r, nation AS n"
    df = parse_sql(q).to_df(spark)
    assert df.count() == 5 * 25

"""UPDATE / DELETE / INSERT statement forms (round 10): the remaining
single-table DML a pipeline maintenance job writes, completing the
statement surface around MERGE INTO (round 8-10) and TABLESAMPLE.

Same batch contract as MERGE (`parser.parse_merge`): tables are
immutable parquet relations, so each statement DESUGARS at parse time
into the existing relational IR and returns the post-statement table as
a query — render-parse fixpoint, dual render, and DuckDB oracle all
come for free.
"""

import pytest

from datafusion_sqlgen_spark.parser import ParseError, parse_sql
from tests.test_operators import check
from tests.test_parser_statements import _fixpoint


def test_update_where_three_way(spark, duck):
    sql = (
        "UPDATE customer SET c_acctbal = c_acctbal * 2, "
        "c_mktsegment = 'DOUBLED' WHERE c_acctbal > 5000"
    )
    _fixpoint(sql)
    p = parse_sql(sql)
    check(
        spark, duck, p.to_df(spark),
        """
        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN c_acctbal > 5000 THEN c_acctbal * 2
                    ELSE c_acctbal END AS c_acctbal,
               CASE WHEN c_acctbal > 5000 THEN 'DOUBLED'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer
        """,
    )
    a = sorted(map(tuple, p.to_df(spark).collect()))
    b = sorted(map(tuple, spark.sql(p.to_sql("spark")).collect()))
    assert a == b


def test_update_unconditional(spark, duck):
    sql = "UPDATE nation AS t SET n_comment = t.n_name"
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        "SELECT n_nationkey, n_name, n_regionkey, n_name AS n_comment "
        "FROM nation",
    )


def test_update_null_predicate_keeps_row(spark, duck):
    """Three-valued UPDATE: a NULL WHERE predicate must NOT update."""
    sql = (
        "UPDATE customer SET c_mktsegment = 'NEVER' "
        "WHERE nullif(c_acctbal, c_acctbal) > 0"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal, "
        "c_mktsegment FROM customer",
    )


def test_delete_where_three_way(spark, duck):
    sql = "DELETE FROM customer WHERE c_acctbal < 0"
    _fixpoint(sql)
    p = parse_sql(sql)
    check(
        spark, duck, p.to_df(spark),
        "SELECT * FROM customer WHERE NOT (c_acctbal < 0)",
    )
    a = sorted(map(tuple, p.to_df(spark).collect()))
    b = sorted(map(tuple, spark.sql(p.to_sql("spark")).collect()))
    assert a == b


def test_delete_null_predicate_keeps_row(spark, duck):
    """Standard DELETE drops rows where p IS TRUE; NULL keeps them."""
    sql = (
        "DELETE FROM customer "
        "WHERE nullif(c_acctbal, c_acctbal) > 0"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        "SELECT * FROM customer",
    )


def test_insert_select_append(spark, duck):
    sql = "INSERT INTO region SELECT r_regionkey + 50, r_name FROM region"
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT * FROM region
        UNION ALL
        SELECT r_regionkey + 50, r_name FROM region
        """,
    )


def test_insert_values_column_list(spark, duck):
    sql = (
        "INSERT INTO region (r_regionkey, r_name) "
        "VALUES (98, 'ATLANTIS'), (99, 'LEMURIA')"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT r_regionkey, r_name FROM region
        UNION ALL
        SELECT * FROM (VALUES (98, 'ATLANTIS'), (99, 'LEMURIA'))
            AS v(r_regionkey, r_name)
        """,
    )


def test_insert_select_column_list_renames_positionally(spark, duck):
    """The column list positionally renames the SELECT's outputs (the
    MERGE column-list rule: the list defines the output layout)."""
    sql = (
        "INSERT INTO region (r_regionkey, r_name) "
        "SELECT r_regionkey + 50 AS shifted, upper(r_name) FROM region"
    )
    _fixpoint(sql)
    check(
        spark, duck, parse_sql(sql).to_df(spark),
        """
        SELECT r_regionkey, r_name FROM region
        UNION ALL
        SELECT r_regionkey + 50, upper(r_name) FROM region
        """,
    )


@pytest.mark.parametrize("bad,msg", [
    ("UPDATE customer SET c_acctbal = 1, c_acctbal = 2",
     "duplicate SET column"),
    ("UPDATE customer SET c_acctbal = 1 FROM orders", "join-update"),
    ("DELETE FROM customer", "truncation"),
    ("INSERT INTO region (r_regionkey) SELECT * FROM region",
     "positionally renamable"),
    ("INSERT INTO region (a, b) VALUES (1)", "different arity"),
    ("INSERT INTO region (a, b, c) SELECT r_regionkey, r_name FROM region",
     "positionally renamable"),
])
def test_dml_rejects_unsupported_forms(bad, msg):
    with pytest.raises(ParseError, match=msg):
        parse_sql(bad)

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


# ---------------------------------------------------------------------------
# PG regex operator spellings ~ ~* !~ !~*
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("op,subject,pattern,expect", [
    ("~", "'abc'", "a.c", True),
    ("~", "'xabcx'", "a.c", True),      # PARTIAL match (PG semantics)
    ("~", "'xyz'", "a.c", False),
    ("~*", "'ABC'", "a.c", True),
    ("~*", "'xyz'", "a.c", False),
    ("!~", "'abc'", "a.c", False),
    ("!~", "'xyz'", "a.c", True),
    ("!~*", "'ABC'", "a.c", False),
    ("!~*", "'xyz'", "a.c", True),
])
def test_pg_regex_ops_fixpoint_and_duckdb(op, subject, pattern, expect):
    q = f"SELECT {subject} {op} '{pattern}' AS m"
    plan = parse_sql(q)
    s = plan.to_sql("spark")
    assert "RLIKE" in s
    assert parse_sql(s).to_sql("spark") == s
    got = duckdb.connect().execute(plan.to_sql("duckdb")).fetchone()[0]
    assert got is expect, (q, got)


def test_pg_regex_partial_match_not_duckdb_native_full_match():
    """PG `~` is a PARTIAL (contains) match; DuckDB's own native `~`
    operator is regexp_full_match — a different operator.  The duckdb
    render must therefore spell regexp_matches, never the bare
    operator, or 'xabcx' ~ 'a.c' silently flips."""
    d = parse_sql("SELECT 'xabcx' ~ 'a.c' AS m").to_sql("duckdb")
    assert "regexp_matches" in d and "~" not in d
    assert duckdb.connect().execute(d).fetchone()[0] is True
    # DuckDB's native operator on the same inputs disagrees — the trap
    assert duckdb.connect().execute(
        "SELECT 'xabcx' ~ 'a.c'").fetchone()[0] is False


def test_pg_regex_ops_execute_on_spark(spark):
    rows = parse_sql(
        "SELECT ('abc' ~ 'a.c') AS a, ('ABC' ~* 'a.c') AS b, "
        "('xyz' !~ 'a.c') AS c, ('XYZ' !~* 'a.c') AS d"
    ).to_df(spark).collect()
    assert rows == [(True, True, True, True)]


def test_pg_regex_rejections():
    with pytest.raises(ParseError, match="string literal"):
        parse_sql("SELECT x ~ y FROM t")
    with pytest.raises(ParseError, match="backslash"):
        parse_sql(r"SELECT x ~ 'a\d' FROM t")


# ---------------------------------------------------------------------------
# Multi-index array access expr[i, j]
# ---------------------------------------------------------------------------

def test_multi_index_parses_to_chained_element_at():
    s = parse_sql("SELECT m[1, 2] AS v FROM t").to_sql("spark")
    assert s == "SELECT element_at(element_at(m, 1), 2) AS v FROM t"
    assert parse_sql(s).to_sql("spark") == s


def test_multi_index_duckdb_render_and_execution():
    plan = parse_sql(
        "SELECT array(array(10, 20), array(30, 40))[2, 1] AS v")
    assert duckdb.connect().execute(
        plan.to_sql("duckdb")).fetchone()[0] == 30


def test_multi_index_dual_render(spark):
    plan = parse_sql(
        "SELECT array(array(10, 20), array(30, 40))[2, 1] AS v")
    a = plan.to_df(spark).collect()
    b = spark.sql(plan.to_sql("spark")).collect()
    assert a == b == [(30,)]


# ---------------------------------------------------------------------------
# ASOF JOIN strict bounds (> / <) — DuckDB's dialect accepts all four ops
# ---------------------------------------------------------------------------

def _asof_strict_duck():
    con = duckdb.connect()
    # l.ts=10 ties r.ts=10 for k=1: the strict/non-strict boundary row
    con.execute("CREATE TABLE l AS SELECT * FROM (VALUES (1,10,'a'),"
                "(1,25,'b'),(2,5,'c'),(2,99,'d'),(3,7,'e')) t(k,ts,ev)")
    con.execute("CREATE TABLE r AS SELECT * FROM (VALUES (1,10,1.0),"
                "(1,20,2.0),(1,30,3.0),(2,7,4.0)) t(k,ts,price)")
    return con


@pytest.mark.parametrize("kw", ["ASOF JOIN", "ASOF LEFT JOIN"])
@pytest.mark.parametrize("op", [">", "<", ">=", "<="])
def test_asof_strict_bounds_match_duckdb_native(kw, op):
    """Both the native duckdb render and the desugared spark render
    (re-run on DuckDB) equal DuckDB's native ASOF for every bound op,
    including the strict forms at an exactly-equal timestamp."""
    con = _asof_strict_duck()
    q = (f"SELECT l.k, l.ts, l.ev, r.ts AS rts FROM l {kw} r "
         f"ON l.k = r.k AND l.ts {op} r.ts")
    plan = parse_sql(q)
    d = plan.to_sql("duckdb")
    assert parse_sql(d).to_sql("duckdb") == d  # surface-form fixpoint
    native = sorted(con.execute(q).fetchall())
    assert sorted(con.execute(d).fetchall()) == native
    des = parse_sql(plan.to_sql("spark")).to_sql("duckdb")
    assert "ASOF JOIN" not in des.upper()
    assert sorted(con.execute(f"SELECT * FROM ({des})").fetchall()) \
        == native


@pytest.mark.parametrize("op,expect_equal_match", [
    (">=", True), (">", False),
])
def test_asof_strict_to_df_equal_timestamp(spark, op, expect_equal_match):
    """The union+window tie order: a strict bound must exclude the
    exactly-equal right row, the non-strict form must match it."""
    spark.sql("CREATE OR REPLACE TEMP VIEW sl AS SELECT * FROM VALUES "
              "(1, 10) AS t(k, ts)")
    spark.sql("CREATE OR REPLACE TEMP VIEW sr AS SELECT * FROM VALUES "
              "(1, 10, 1.0), (1, 5, 2.0) AS t(k, ts, price)")
    q = (f"SELECT l.k, l.ts, r.ts AS rts, r.price FROM sl AS l "
         f"ASOF JOIN sr AS r ON l.k = r.k AND l.ts {op} r.ts")
    rows = parse_sql(q).to_df(spark).collect()
    assert len(rows) == 1
    assert (rows[0]["rts"] == 10) is expect_equal_match
    assert (rows[0]["price"] == (1.0 if expect_equal_match else 2.0))


@pytest.mark.parametrize("kw", ["ASOF JOIN", "ASOF LEFT JOIN"])
def test_asof_using_shorthand_matches_on_form(kw):
    """DuckDB's USING shorthand (keys first, ordering column last, >=
    semantics) desugars to the explicit qualified ON conjunction."""
    con = _asof_strict_duck()
    q_using = (f"SELECT l.k, l.ts, l.ev, r.price FROM l {kw} r "
               f"USING (k, ts)")
    q_on = (f"SELECT l.k, l.ts, l.ev, r.price FROM l {kw} r "
            f"ON l.k = r.k AND l.ts >= r.ts")
    pu = parse_sql(q_using)
    d = pu.to_sql("duckdb")
    assert "USING" not in d and "l.ts >= r.ts" in d.replace("(", "").replace(")", "")
    assert parse_sql(d).to_sql("duckdb") == d
    assert sorted(con.execute(d).fetchall()) \
        == sorted(con.execute(q_on).fetchall()) \
        == sorted(con.execute(q_using).fetchall())


def test_asof_using_rejections():
    with pytest.raises(ParseError, match="at least two"):
        parse_sql("SELECT 1 FROM l ASOF JOIN r USING (ts)")
    with pytest.raises(ParseError, match="named left relation"):
        parse_sql("SELECT 1 FROM a JOIN b ON a.x = b.x "
                  "ASOF JOIN r USING (k, ts)")


@pytest.mark.parametrize("proj", ["*", "l.*", "r.*", "l.ts, r.*"])
def test_asof_select_star_flattens_like_sql(spark, proj):
    """SELECT * / l.* / r.* above an ASOF join: to_df must flatten the
    match struct to the same column shape both SQL renders produce
    (native duckdb ASOF and the spark-dialect desugar flatten stars)."""
    spark.sql("CREATE OR REPLACE TEMP VIEW fl AS SELECT * FROM VALUES "
              "(1, 10), (1, 25), (2, 5) AS t(k, ts)")
    spark.sql("CREATE OR REPLACE TEMP VIEW fr AS SELECT * FROM VALUES "
              "(1, 8, 1.0), (1, 20, 2.0) AS t(k, ts, price)")
    con = duckdb.connect()
    con.execute("CREATE TABLE fl AS SELECT * FROM (VALUES (1, 10), "
                "(1, 25), (2, 5)) t(k, ts)")
    con.execute("CREATE TABLE fr AS SELECT * FROM (VALUES (1, 8, 1.0), "
                "(1, 20, 2.0)) t(k, ts, price)")
    q = (f"SELECT {proj} FROM fl AS l ASOF LEFT JOIN fr AS r "
         "ON l.k = r.k AND l.ts >= r.ts")
    plan = parse_sql(q)
    mine = plan.to_df(spark)
    via_sql = spark.sql(plan.to_sql("spark"))
    assert mine.columns == via_sql.columns, (proj, mine.columns,
                                             via_sql.columns)
    native = con.execute(q)
    assert mine.columns == [d[0] for d in native.description]
    key = lambda r: tuple((v is None, v) for v in r)  # noqa: E731
    a = sorted(map(tuple, normalize_rows(mine.collect())), key=key)
    b = sorted(map(tuple, normalize_rows(native.fetchall())), key=key)
    c = sorted(map(tuple, normalize_rows(via_sql.collect())), key=key)
    assert a == b == c


def test_asof_composes_in_cte_subquery_and_join_chain(spark):
    """AsofJoin as a CTE body, as a derived table joined onward, and
    chained with a further join at the same FROM level — all three
    render-fixpoint, execute on DuckDB equal to the native form, and
    the chain resolves struct-qualified right columns through the
    downstream join on the DataFrame path too."""
    con = _asof_strict_duck()
    cte = ("WITH m AS (SELECT l.k, l.ts, r.price FROM l ASOF LEFT JOIN "
           "r ON l.k = r.k AND l.ts >= r.ts) "
           "SELECT k, count(*) AS n, sum(price) AS sp FROM m GROUP BY k")
    chain = ("SELECT l.k, r.price, x.ev FROM l ASOF JOIN r "
             "ON l.k = r.k AND l.ts >= r.ts "
             "JOIN l AS x ON x.k = l.k AND x.ts = l.ts")
    for q in (cte, chain):
        d = parse_sql(q).to_sql("duckdb")
        assert parse_sql(d).to_sql("duckdb") == d
        assert sorted(con.execute(d).fetchall()) \
            == sorted(con.execute(q).fetchall())
    # Spark DataFrame path for the chain: the match struct survives the
    # downstream join and keeps resolving r.price
    spark.sql("CREATE OR REPLACE TEMP VIEW cl AS SELECT * FROM VALUES "
              "(1, 10, 'a'), (1, 25, 'b'), (2, 5, 'c') AS t(k, ts, ev)")
    spark.sql("CREATE OR REPLACE TEMP VIEW cr AS SELECT * FROM VALUES "
              "(1, 8, 1.0), (1, 20, 2.0) AS t(k, ts, price)")
    qs = ("SELECT l.k, r.price, x.ev FROM cl AS l ASOF JOIN cr AS r "
          "ON l.k = r.k AND l.ts >= r.ts "
          "JOIN cl AS x ON x.k = l.k AND x.ts = l.ts")
    rows = sorted(map(tuple, parse_sql(qs).to_df(spark).collect()))
    con2 = duckdb.connect()
    con2.execute("CREATE TABLE cl AS SELECT * FROM (VALUES "
                 "(1, 10, 'a'), (1, 25, 'b'), (2, 5, 'c')) t(k, ts, ev)")
    con2.execute("CREATE TABLE cr AS SELECT * FROM (VALUES "
                 "(1, 8, 1.0), (1, 20, 2.0)) t(k, ts, price)")
    assert rows == sorted(con2.execute(qs).fetchall())


def test_asof_select_star_flattens_through_where(spark):
    """Review r11 #1: a WHERE between the star and the ASOF join
    interposes a Filter; the star expansion must see through it (and
    ORDER/LIMIT) or to_df surfaces the match struct while both SQL
    renders flatten — a dual-path column-shape divergence."""
    spark.sql("CREATE OR REPLACE TEMP VIEW wl AS SELECT * FROM VALUES "
              "(1, 10), (1, 25), (2, 5) AS t(k, ts)")
    spark.sql("CREATE OR REPLACE TEMP VIEW wr AS SELECT * FROM VALUES "
              "(1, 8, 1.0), (1, 20, 2.0) AS t(k, ts, price)")
    con = duckdb.connect()
    con.execute("CREATE TABLE wl AS SELECT * FROM (VALUES (1, 10), "
                "(1, 25), (2, 5)) t(k, ts)")
    con.execute("CREATE TABLE wr AS SELECT * FROM (VALUES (1, 8, 1.0), "
                "(1, 20, 2.0)) t(k, ts, price)")
    for q in (
        "SELECT * FROM wl AS l ASOF LEFT JOIN wr AS r "
        "ON l.k = r.k AND l.ts >= r.ts WHERE l.ts > 5",
        "SELECT l.* FROM wl AS l ASOF LEFT JOIN wr AS r "
        "ON l.k = r.k AND l.ts >= r.ts WHERE l.ts > 5 "
        "ORDER BY l.ts LIMIT 2",
    ):
        plan = parse_sql(q)
        mine = plan.to_df(spark)
        native = con.execute(q)
        assert mine.columns == [d[0] for d in native.description], (
            q, mine.columns)
        key = lambda r: tuple((v is None, v) for v in r)  # noqa: E731
        assert sorted(map(tuple, normalize_rows(mine.collect())),
                      key=key) \
            == sorted(map(tuple, normalize_rows(native.fetchall())),
                      key=key)


def test_asof_star_with_unknown_alias_errors_like_sql(spark):
    """Review r11 #3: a star qualified by an alias that is neither
    side must raise (like both SQL renders do), never silently resolve
    to the left columns."""
    spark.sql("CREATE OR REPLACE TEMP VIEW wl AS SELECT * FROM VALUES "
              "(1, 10) AS t(k, ts)")
    spark.sql("CREATE OR REPLACE TEMP VIEW wr AS SELECT * FROM VALUES "
              "(1, 8, 1.0) AS t(k, ts, price)")
    plan = parse_sql(
        "SELECT q.* FROM wl AS l ASOF JOIN wr AS r "
        "ON l.k = r.k AND l.ts >= r.ts")
    with pytest.raises(Exception, match="q|resolve|found"):
        plan.to_df(spark).collect()


def test_comma_join_right_full_suffix_rejected():
    """Review r11 #2 (verified vs DuckDB): comma binds loosest, so
    left-folding a following RIGHT/FULL JOIN regroups — unmatched
    right rows would NULL-pad the crossed side instead of being
    crossed with every row.  Reject loudly instead of silently
    diverging; inner/left/semi/anti suffixes stay accepted (their
    left fold is result-equivalent)."""
    for bad in (
        "SELECT 1 FROM a, b RIGHT JOIN c ON b.y = c.z",
        "SELECT 1 FROM a, b FULL JOIN c ON b.y = c.z",
        "SELECT 1 FROM a, b JOIN c ON b.y = c.z "
        "RIGHT JOIN d ON c.z = d.w",
    ):
        with pytest.raises(ParseError, match="comma binds loosest"):
            parse_sql(bad)
    # without a comma, RIGHT/FULL parse as before
    s = parse_sql(
        "SELECT 1 AS one FROM a RIGHT JOIN b ON a.x = b.y").to_sql(
        "spark")
    assert "RIGHT JOIN" in s


def test_comma_join_keyless_is_honest_cartesian(spark):
    """With no predicate the comma join IS a cross product — it must
    execute (tiny dims are legitimate), not error."""
    q = "SELECT r.r_name, n.n_name FROM region AS r, nation AS n"
    df = parse_sql(q).to_df(spark)
    assert df.count() == 5 * 25

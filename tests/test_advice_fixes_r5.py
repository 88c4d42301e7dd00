"""Round-11 ADVICE fixes (VERDICT r10 / ADVICE r10):

1. (high) DISTINCT window aggregate + FILTER (WHERE ...): the
   first-occurrence flag is now computed AMONG FILTERED ROWS (pred in
   the flag window's PARTITION BY, pred folded into the CASE) instead
   of flagging over all rows and filtering afterwards — the old form
   counted a value only if its arbitrarily-chosen flag row passed the
   filter, a nondeterministic undercount both dialects rendered
   identically (oracle-invisible).
2. (medium) _expr_find recurses into arbitrarily nested tuples via the
   same child iterator as _expr_transform.walk, so WindowExprs inside
   Case.whens are seen by the desugar collectors (previously: raw
   KeyError alongside a top-level window, or un-desugared SQL Spark
   rejects when nested-only).
3. (low) EXCLUDE GROUP/TIES over an interval RANGE frame that spans
   the current row is accepted (FrameBound covers() mirrored from
   _exclude_parts) instead of rejected with a contradictory message.
"""

import duckdb
import pytest

from datafusion_sqlgen_spark.parser import ParseError, parse_sql
from tests.conftest import normalize_rows


# ---------------------------------------------------------------------------
# 1. DISTINCT window aggregate + FILTER (WHERE ...)
# ---------------------------------------------------------------------------

def _dst_filter_duck():
    """Fixture engineered to catch the flag-before-filter bug: in
    partition k=1 the value x=5 occurs first with c=false (the old
    desugar could flag that row, then filter it out and undercount)
    and again with c=true; x=7 occurs ONLY with c=false (must never
    count); x=9 only with c=true (must count)."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        "(1, 1, 5, false), (1, 2, 5, true), (1, 3, 7, false), "
        "(1, 4, 9, true), (1, 5, 5, true), (1, 6, NULL, true), "
        "(2, 1, 3, false), (2, 2, 3, false)) v(k, o, x, c)"
    )
    return con


@pytest.mark.parametrize("fn", ["count", "sum", "avg"])
def test_win_distinct_filter_matches_correlated_oracle(fn):
    """DuckDB 1.0's NATIVE distinct-window+FILTER throws an INTERNAL
    assertion error, so the independent oracle is a correlated
    subquery over the filtered rows — machinery-free."""
    con = _dst_filter_duck()
    q = (f"SELECT k, o, {fn}(DISTINCT x) FILTER (WHERE c) OVER "
         "(PARTITION BY k) AS v FROM t")
    plan = parse_sql(q)
    s = plan.to_sql("spark")
    assert parse_sql(s).to_sql("spark") == s
    order = "ORDER BY k, o"
    mine = con.execute(
        f"SELECT * FROM ({plan.to_sql('duckdb')}) {order}").fetchall()
    oracle = con.execute(
        f"SELECT k, o, (SELECT {fn}(DISTINCT t2.x) FROM t t2 "
        f"WHERE t2.k = t.k AND t2.c) AS v FROM t {order}"
    ).fetchall()
    assert normalize_rows(mine, 9) == normalize_rows(oracle, 9)
    # k=1: distinct passing values are {5, 9} -> count 2 (the old
    # desugar could nondeterministically report 1)
    if fn == "count":
        assert mine[0][2] == 2


def test_win_distinct_filter_running_matches_correlated_oracle():
    """Ordered (running) form: x=5's first occurrence fails the
    filter, so the running distinct count must rise only at o=2 (its
    first PASSING row)."""
    con = _dst_filter_duck()
    q = ("SELECT k, o, count(DISTINCT x) FILTER (WHERE c) OVER "
         "(PARTITION BY k ORDER BY o) AS v FROM t")
    plan = parse_sql(q)
    mine = con.execute(
        f"SELECT * FROM ({plan.to_sql('duckdb')}) ORDER BY k, o"
    ).fetchall()
    oracle = con.execute(
        "SELECT k, o, (SELECT count(DISTINCT t2.x) FROM t t2 "
        "WHERE t2.k = t.k AND t2.c AND t2.o <= t.o) AS v "
        "FROM t ORDER BY k, o"
    ).fetchall()
    assert mine == oracle
    assert [r[2] for r in mine if r[0] == 1] == [0, 1, 1, 2, 2, 2]


def test_win_distinct_filter_render_folds_filter_into_case():
    s = parse_sql(
        "SELECT count(DISTINCT x) FILTER (WHERE c) OVER "
        "(PARTITION BY k) AS v FROM t"
    ).to_sql("spark")
    assert "FILTER" not in s  # folded into the flag CASE, not kept
    assert "AND" in s and "__dst" in s  # rn=1 ∧ pred guard
    # the flag window partitions by the predicate too
    assert "PARTITION BY k, x, c" in s


def test_win_distinct_filter_dual_render(spark):
    q = ("SELECT o_orderkey, count(DISTINCT o_orderpriority) "
         "FILTER (WHERE o_orderstatus = 'O') OVER "
         "(PARTITION BY o_custkey) AS n FROM orders "
         "WHERE o_orderkey < 300")
    plan = parse_sql(q)
    a = normalize_rows(plan.to_df(spark).collect())
    b = normalize_rows(spark.sql(plan.to_sql("spark")).collect())
    assert a == b and len(a) == 300


# ---------------------------------------------------------------------------
# 2. _expr_find sees through nested tuples (Case.whens)
# ---------------------------------------------------------------------------

def test_case_nested_distinct_window_desugars():
    """Nested-only DISTINCT window: previously escaped the collector
    and rendered DISTINCT-over-window SQL Spark rejects at analysis
    while DuckDB executes (crash-vs-value divergence)."""
    con = _dst_filter_duck()
    q = ("SELECT k, o, CASE WHEN o > 1 THEN "
         "count(DISTINCT x) OVER (PARTITION BY k) ELSE 0 END AS v "
         "FROM t")
    plan = parse_sql(q)
    s = plan.to_sql("spark")
    assert "DISTINCT" not in s and "__dst" in s
    assert parse_sql(s).to_sql("spark") == s
    mine = con.execute(
        f"SELECT * FROM ({plan.to_sql('duckdb')}) ORDER BY k, o"
    ).fetchall()
    native = con.execute(f"SELECT * FROM ({q}) ORDER BY k, o").fetchall()
    assert mine == native


def test_case_nested_plus_toplevel_distinct_window_no_keyerror():
    """Previously a raw KeyError at parse (collector missed the nested
    node, rewrite found it and missed the table entry)."""
    q = ("SELECT count(DISTINCT x) OVER (PARTITION BY k) AS a, "
         "CASE WHEN o > 1 THEN sum(DISTINCT x) OVER (PARTITION BY k) "
         "END AS b FROM t")
    s = parse_sql(q).to_sql("spark")
    assert "DISTINCT" not in s
    assert parse_sql(s).to_sql("spark") == s


def test_case_nested_groups_frame_desugars():
    """Nested-only GROUPS frame: previously hit the renderer
    RuntimeError instead of desugaring to the RANGE-over-dense_rank
    form."""
    q = ("SELECT o_orderkey, CASE WHEN o_orderkey > 0 THEN "
         "sum(o_custkey) OVER (PARTITION BY o_orderstatus "
         "ORDER BY o_orderdate GROUPS BETWEEN 1 PRECEDING AND "
         "1 FOLLOWING) END AS v FROM orders")
    s = parse_sql(q).to_sql("spark")
    assert "GROUPS" not in s and "dense_rank" in s.lower()
    assert parse_sql(s).to_sql("spark") == s


def test_case_nested_window_filter_still_rejected_shapes():
    """The sliding-frame rejection must fire for nested windows too —
    same guard, now reachable."""
    with pytest.raises(ParseError, match="sliding"):
        parse_sql(
            "SELECT CASE WHEN k = 1 THEN count(DISTINCT x) OVER "
            "(PARTITION BY k ORDER BY o ROWS BETWEEN 1 PRECEDING AND "
            "CURRENT ROW) END AS v FROM t"
        )


# ---------------------------------------------------------------------------
# 3. EXCLUDE GROUP/TIES over interval RANGE frames
# ---------------------------------------------------------------------------

def _interval_duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        "(1, DATE '2024-01-01', 10), (1, DATE '2024-01-01', 20), "
        "(1, DATE '2024-01-02', 30), (1, DATE '2024-01-05', 40), "
        "(2, DATE '2024-01-01', 5), (2, DATE '2024-01-01', NULL)) "
        "v(k, d, x)"
    )
    return con


@pytest.mark.parametrize("mode", ["GROUP", "TIES"])
def test_exclude_peers_interval_frame_accepted_and_matches(mode):
    con = _interval_duck()
    q = (f"SELECT k, d, x, sum(x) OVER (PARTITION BY k ORDER BY d "
         f"RANGE BETWEEN INTERVAL '2' DAY PRECEDING AND CURRENT ROW "
         f"EXCLUDE {mode}) AS v FROM t")
    mine = con.execute(
        f"SELECT * FROM ({parse_sql(q).to_sql('duckdb')}) "
        "ORDER BY k, d, coalesce(x, -1)"
    ).fetchall()
    native = con.execute(
        f"SELECT * FROM ({q}) ORDER BY k, d, coalesce(x, -1)"
    ).fetchall()
    assert mine == native


def test_exclude_peers_nonspanning_interval_frame_still_rejected():
    with pytest.raises(ParseError, match="spans the current row"):
        parse_sql(
            "SELECT sum(x) OVER (ORDER BY d RANGE BETWEEN "
            "INTERVAL '3' DAY PRECEDING AND INTERVAL '1' DAY PRECEDING "
            "EXCLUDE GROUP) AS v FROM t"
        )

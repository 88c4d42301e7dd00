"""Hypothesis fuzz for the ASOF JOIN surface against DuckDB's native
ASOF — random (key, ts) tables, all four bound ops, inner and left,
both the native duckdb render and the desugared spark render re-run on
DuckDB.  JVM-free (the Spark execution lane is pinned by deterministic
tests in test_parser_round10b/11); the right side is built unique on
(key, ts) per the standard ASOF precondition.
"""

import duckdb
import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from datafusion_sqlgen_spark.parser import parse_sql

_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)),
    min_size=0, max_size=12,
)


@settings(max_examples=120, deadline=None)
@given(lrows=_rows, rrows=_rows,
       op=st.sampled_from([">=", "<=", ">", "<"]),
       left_outer=st.booleans())
def test_asof_desugar_and_native_render_match_duckdb(lrows, rrows, op,
                                                     left_outer):
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k INT, ts INT)")
    con.executemany("INSERT INTO l VALUES (?, ?)", lrows or [(99, 99)])
    con.execute("CREATE TABLE r (k INT, ts INT, v INT)")
    rseen, rins = set(), []
    for i, (k, ts) in enumerate(rrows):
        if (k, ts) not in rseen:  # ASOF precondition: unique (key, ts)
            rseen.add((k, ts))
            rins.append((k, ts, i))
    con.executemany("INSERT INTO r VALUES (?, ?, ?)",
                    rins or [(98, 98, 0)])
    kw = "ASOF LEFT JOIN" if left_outer else "ASOF JOIN"
    q = (f"SELECT l.k, l.ts, r.ts AS rts, r.v FROM l {kw} r "
         f"ON l.k = r.k AND l.ts {op} r.ts")
    native = sorted(con.execute(q).fetchall())
    plan = parse_sql(q)
    mine_native_render = sorted(con.execute(plan.to_sql("duckdb"))
                                .fetchall())
    assert mine_native_render == native
    desugared = parse_sql(plan.to_sql("spark")).to_sql("duckdb")
    mine_desugar = sorted(
        con.execute(f"SELECT * FROM ({desugared})").fetchall())
    assert mine_desugar == native, (q, mine_desugar, native)


def _model_asof_tolerance(lrows, rrows, op, tol, left_outer):
    """Pure-python merge_asof-with-tolerance model: for each left row
    pick the nearest right row per `op`, then null it when outside
    [ts - tol, ts] (backward) / [ts, ts + tol] (forward)."""
    out = []
    for lk, lts in lrows:
        cands = []
        for rk, rts, rv in rrows:
            if rk != lk:
                continue
            if op == ">=" and lts >= rts:
                cands.append((rts, rv))
            elif op == "<=" and lts <= rts:
                cands.append((rts, rv))
            elif op == ">" and lts > rts:
                cands.append((rts, rv))
            elif op == "<" and lts < rts:
                cands.append((rts, rv))
        backward = op in (">=", ">")
        pick = (max(cands) if backward else min(cands)) if cands else None
        if pick is not None:
            rts, rv = pick
            ok = (rts >= lts - tol) if backward else (rts <= lts + tol)
            if not ok:
                pick = None
        if pick is not None:
            out.append((lk, lts, pick[0], pick[1]))
        elif left_outer:
            out.append((lk, lts, None, None))
    return sorted(out, key=lambda t: tuple(
        (v is None, v) for v in t))


@settings(max_examples=100, deadline=None)
@given(lrows=_rows, rrows=_rows,
       op=st.sampled_from([">=", "<=", ">", "<"]),
       tol=st.integers(0, 8),
       left_outer=st.booleans())
def test_asof_tolerance_desugar_matches_python_model(lrows, rrows, op,
                                                     tol, left_outer):
    """The r12 tolerance bound: the spark-dialect union+window desugar
    (re-rendered to DuckDB via the round-trip — the only executable
    lane here, since the direct DuckDB render fails closed) must match
    a pure-python merge_asof-with-tolerance model on random data.
    Strict bounds (> / <) included: tolerance composes with them."""
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k INT, ts INT)")
    con.executemany("INSERT INTO l VALUES (?, ?)", lrows or [(99, 99)])
    con.execute("CREATE TABLE r (k INT, ts INT, v INT)")
    rseen, rins = set(), []
    for i, (k, ts) in enumerate(rrows):
        if (k, ts) not in rseen:
            rseen.add((k, ts))
            rins.append((k, ts, i))
    con.executemany("INSERT INTO r VALUES (?, ?, ?)",
                    rins or [(98, 98, 0)])
    backward = op in (">=", ">")
    sign = "-" if backward else "+"
    tolop = ">=" if backward else "<="
    kw = "ASOF LEFT JOIN" if left_outer else "ASOF JOIN"
    q = (f"SELECT l.k, l.ts, r.ts AS rts, r.v FROM l {kw} r "
         f"ON l.k = r.k AND l.ts {op} r.ts "
         f"AND r.ts {tolop} l.ts {sign} {tol}")
    plan = parse_sql(q)
    with pytest.raises(ValueError):
        plan.to_sql("duckdb")  # fail-closed contract
    desugared = parse_sql(plan.to_sql("spark")).to_sql("duckdb")
    key = lambda t: tuple((v is None, v) for v in t)
    mine = sorted(con.execute(f"SELECT * FROM ({desugared})").fetchall(),
                  key=key)
    model = _model_asof_tolerance(
        [tuple(x) for x in (lrows or [(99, 99)])], rins, op, tol,
        left_outer)
    assert mine == model, (q, mine, model)

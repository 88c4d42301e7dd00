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

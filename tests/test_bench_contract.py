"""Stdout contract for bench.py (VERDICT r9 item 3, carried from r8 item 4).

The driver keeps only a ~2,000-char TAIL of bench stdout and JSON-parses
the last line into BENCH_r{N}.json.  With 112 headline queries the big
payload line loses its head to the tail cut, so the artifact recorded
"parsed": null for two rounds.  bench.py now prints a compact summary as
the FINAL stdout line; these tests pin that protocol.

The end-to-end test runs bench.py in a subprocess on ONE query at
sf0.001 (SPARK_GRAFT_BENCH_QUERIES test hook) — real Spark, real stdout
— and asserts the last line parses, is tail-proof small, and agrees
with the full payload line above it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

COMPACT_KEYS = {
    "metric", "value", "unit", "machine_canary_sec",
    "machine_canary_par8_sec", "canary_contention_ratio",
    "value_per_canary", "n_queries", "spread_median", "sf",
    "full_artifact",
}


def test_bench_stdout_last_line_is_compact_and_parsable():
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_QUERIES="ref_scan_filter",
        # pin the CLEAN path: disable the contention diversion so a
        # loaded CI host can't flip full_artifact mid-test (the gate
        # itself is pinned by test_contended_run_diverts_artifact)
        SPARK_GRAFT_CONTENTION_MAX="1e9",
    )
    proc = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) >= 2, lines

    # the driver's parse: last non-empty stdout line must be JSON
    compact = json.loads(lines[-1])
    assert set(compact) == COMPACT_KEYS
    # tail-proof: fixed key set, no per-query dict — must fit the
    # ~2,000-char tail with wide margin regardless of catalog growth
    assert len(lines[-1]) < 400, len(lines[-1])
    assert compact["n_queries"] == 1
    assert compact["unit"] == "sec"
    assert compact["value"] > 0
    assert compact["machine_canary_sec"] > 0
    assert compact["sf"] == 0.001

    # the full payload line directly above must agree on the headline
    full = json.loads(lines[-2])
    assert full["value"] == compact["value"]
    assert full["machine_canary_sec"] == compact["machine_canary_sec"]
    assert set(full["queries"]) == {"ref_scan_filter"}

    # subset runs write a sibling artifact, never the round artifact
    assert compact["full_artifact"] == "bench_full_subset.json"
    sub = os.path.join(REPO, "bench_full_subset.json")
    assert os.path.exists(sub)
    os.remove(sub)


def test_contended_run_diverts_artifact():
    """Fail-closed contention gate (VERDICT r12 item 1): when the
    parallel/single canary ratio exceeds SPARK_GRAFT_CONTENTION_MAX the
    run must be written to `*.contended.json` and NEVER overwrite the
    clean artifact.  MAX=0 forces every run to read as contended."""
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_QUERIES="ref_scan_filter",
        SPARK_GRAFT_CONTENTION_MAX="0",
    )
    clean = os.path.join(REPO, "bench_full_subset.json")
    contended = os.path.join(REPO, "bench_full_subset.contended.json")
    for p in (clean, contended):
        if os.path.exists(p):
            os.remove(p)
    proc = subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    compact = json.loads(lines[-1])
    assert compact["contended"] is True
    assert compact["full_artifact"] == "bench_full_subset.contended.json"
    # the committed-baseline path is untouched; the diverted file exists
    assert not os.path.exists(clean)
    assert os.path.exists(contended)
    os.remove(contended)


def test_compact_line_source_has_no_queries_dict():
    """Static pin: the final print must not include the `queries` dict
    (that is exactly what overflowed the tail).  Guards against a
    refactor folding the compact line back into the big payload."""
    src = open(BENCH).read()
    tail = src[src.index("compact = {"):]
    assert '"queries"' not in tail.split("print(json.dumps(compact))")[0]


def test_headline_names_all_exist_in_catalog():
    """Every bench HEADLINE name must be a live catalog workload — a
    typo'd or renamed row would otherwise only surface minutes into
    the round-close bench as a KeyError."""
    import bench

    from datafusion_sqlgen_spark.workloads import build_queries

    catalog = set(build_queries())
    missing = [n for n in bench.HEADLINE if n not in catalog]
    assert missing == [], missing
    # and no duplicates (a dup would double-count the headline total)
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))

"""Unit tests for scripts/bench_compare.py (VERDICT r9 item 4).

The spread-band gate (gate 2) previously compared raw new-host seconds
against old-host seconds; on a 2x-faster host a real 1.5x normalized
regression shrinks to a raw |n - o| below the band and is silently
dropped.  Both gates must operate in old-host seconds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "scripts", "bench_compare.py")


def _artifact(path, canary, queries, jitter):
    """bench_full.json-shaped artifact; each query gets 3 samples with
    total spread `jitter` around the given median."""
    samples = {
        q: [round(m - jitter / 2, 4), m, round(m + jitter / 2, 4)]
        for q, m in queries.items()
    }
    art = {
        "metric": "headline_queries_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "queries_spread": {
            q: round(jitter / m, 4) for q, m in queries.items()
        },
        "machine_canary_sec": canary,
        "samples": samples,
        "sf": 0.1,
    }
    with open(path, "w") as f:
        json.dump(art, f)
    return path


def _run(old, new):
    proc = subprocess.run(
        [sys.executable, TOOL, old, new], capture_output=True, text=True,
        timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def test_real_regression_on_faster_host_is_reported(tmp_path):
    # New host is 2x FASTER (canary 0.6 -> 0.3).  q_reg truly regressed
    # 1.5x in normalized terms: 2.0s old -> 1.5s raw new (= 3.0s in
    # old-host seconds).  Raw |n - o| = 0.5s; old band 0.1 + new band
    # 0.05/0.5 = 0.2 in old-host seconds, but normalized |n/norm - o| =
    # 1.0s >> 0.2 — must be reported.  The buggy raw gate also passed
    # here only when jitter is small; widen jitter so the RAW delta
    # (0.5) is inside the raw band sum (0.3+0.3=0.6) — the buggy code
    # drops it, the fixed code keeps it (normalized delta 1.0 > 0.9).
    old = _artifact(tmp_path / "old.json", 0.6, {"q_reg": 2.0, "q_ok": 1.0},
                    jitter=0.3)
    new = _artifact(tmp_path / "new.json", 0.3, {"q_reg": 1.5, "q_ok": 0.5},
                    jitter=0.3)
    out = _run(str(old), str(new))
    assert "MATERIAL" in out
    assert "q_reg" in out, out
    assert "NONE" not in out


def test_pure_host_speed_shift_is_not_reported(tmp_path):
    # Same code, new host 2x faster: every query exactly halves.
    old = _artifact(tmp_path / "old.json", 0.6,
                    {"q1": 2.0, "q2": 1.0, "q3": 0.4}, jitter=0.1)
    new = _artifact(tmp_path / "new.json", 0.3,
                    {"q1": 1.0, "q2": 0.5, "q3": 0.2}, jitter=0.1)
    out = _run(str(old), str(new))
    assert "NONE" in out, out
    # and the normalized total reads ~1.0x
    assert "normalized 1.00x" in out


def test_equal_hosts_noise_inside_band_not_reported(tmp_path):
    # Equal canaries, a 1.5x ratio on a tiny query whose movement is
    # inside the combined spread band -> noise, not a mover.
    old = _artifact(tmp_path / "old.json", 0.5, {"q1": 0.10}, jitter=0.12)
    new = _artifact(tmp_path / "new.json", 0.5, {"q1": 0.15}, jitter=0.12)
    out = _run(str(old), str(new))
    assert "NONE" in out, out


def test_equal_hosts_real_regression_reported(tmp_path):
    old = _artifact(tmp_path / "old.json", 0.5, {"q1": 1.0}, jitter=0.05)
    new = _artifact(tmp_path / "new.json", 0.5, {"q1": 1.6}, jitter=0.05)
    out = _run(str(old), str(new))
    assert "q1" in out and "NONE" not in out, out

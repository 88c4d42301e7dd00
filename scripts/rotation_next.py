#!/usr/bin/env python
"""Print the next round's oldest-first driver-sample rotation.

Reads every CORRECTNESS_r*.json in the repo root, computes each catalog
workload's latest-sampled round, and emits:

  1. the 50 names to place first in ``_SAMPLE_PRIORITY`` (stalest
     first, never-sampled new workloads after the stale tail in catalog
     order),
  2. the overflow queue (position 51+), and
  3. any workload whose LATEST driver row is red — those outrank
     freshness and are flagged loudly.

The round-6 rotation was assembled by hand from this same arithmetic
(tests/test_advice_fixes_r3.py regenerates it); this script makes
round 7+ mechanical:

    python scripts/rotation_next.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLE = 50


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from datafusion_sqlgen_spark.workloads import build_queries

    catalog = list(build_queries())
    latest_round: dict[str, int] = {}
    latest_row: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        with open(path) as f:
            for name, row in json.load(f).items():
                latest_round[name] = rnd
                latest_row[name] = row

    red = [
        n for n in catalog
        if n in latest_row and not latest_row[n].get("hash_match")
    ]
    if red:
        print("!! RED at latest check (fix first, sample first):")
        for n in red:
            print(f"   {n} (r{latest_round[n]}: {latest_row[n].get('err')})")

    # stalest first; never-sampled (new) workloads queue AFTER the
    # stale backlog in catalog order, exactly like rounds 5 and 6 did
    sampled = [n for n in catalog if n in latest_round]
    never = [n for n in catalog if n not in latest_round]
    by_staleness = sorted(
        sampled, key=lambda n: (latest_round[n], catalog.index(n))
    )
    ordered = red + [n for n in by_staleness if n not in red] + never

    print(f"# catalog: {len(catalog)} | ever sampled: {len(sampled)} | "
          f"never: {len(never)} | red-at-latest: {len(red)}")
    print(f"# --- next sample (positions 1-{SAMPLE}) ---")
    for n in ordered[:SAMPLE]:
        tag = f"r{latest_round[n]}" if n in latest_round else "never"
        print(f"{n}  # {tag}")
    print("# --- overflow queue (51+) ---")
    for n in ordered[SAMPLE:SAMPLE + 15]:
        tag = f"r{latest_round[n]}" if n in latest_round else "never"
        print(f"{n}  # {tag}")


if __name__ == "__main__":
    main()

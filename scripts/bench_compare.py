#!/usr/bin/env python
"""Canary-normalized cross-round bench comparison (VERDICT r7 item 3).

Reads two ``bench_full.json`` artifacts (old, new) and reports, for the
common query set:

  * the canary on each side — if they differ materially (>10%), raw
    seconds are NOT comparable and every ratio below is normalized by
    ``query_time / machine_canary_sec`` (the round-6 A/B measured hosts
    differing 2.5-3x on byte-identical code);
  * total over common queries, raw and normalized;
  * per-query movers, where a mover must clear BOTH gates:
      1. normalized ratio outside [1/threshold, threshold] (default 1.4 —
         the VERDICT r7 investigate bar), and
      2. the movement exceeds the two runs' combined spread band —
         |new_med - old_med| > (new_max-new_min) + (old_max-old_min) —
         so run-to-run noise (median per-query spread ~0.18s at sf0.1)
         can never be reported as a regression.

Usage: python scripts/bench_compare.py OLD.json NEW.json [--threshold 1.4]
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.4)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)

    co, cn = old.get("machine_canary_sec"), new.get("machine_canary_sec")
    common = sorted(set(old["queries"]) & set(new["queries"]))
    t_old = sum(old["queries"][q] for q in common)
    t_new = sum(new["queries"][q] for q in common)
    print(f"common queries: {len(common)}  "
          f"(old-only {len(set(old['queries']) - set(common))}, "
          f"new-only {len(set(new['queries']) - set(common))})")
    print(f"canary: old {co}s, new {cn}s", end="")
    norm = 1.0
    if co and cn:
        drift = cn / co
        norm = drift
        print(f" — host speed ratio {drift:.2f}x"
              + (" (MATERIAL: compare normalized only)"
                 if abs(drift - 1) > 0.10 else " (equal hosts)"))
    else:
        print(" — canary missing on one side; raw-only comparison")
    print(f"common total: {t_old:.1f}s -> {t_new:.1f}s  "
          f"raw {t_new / t_old:.2f}x, normalized "
          f"{(t_new / norm) / t_old:.2f}x")

    def band(art: dict, q: str) -> float:
        s = art.get("samples", {}).get(q)
        if s:
            return max(s) - min(s)
        med, spread = art["queries"][q], art.get("queries_spread", {}).get(q, 0)
        return med * spread

    movers = []
    for q in common:
        o, n = old["queries"][q], new["queries"][q]
        if not o or not n:
            continue
        ratio = (n / norm) / o
        if ratio > args.threshold or ratio < 1 / args.threshold:
            # Gate 2 must operate in OLD-HOST seconds like gate 1: a raw
            # |n - o| on a 2x-faster host shrinks (or inverts) a real
            # regression under the band and silently drops it (ADVICE r9
            # medium).  Normalize the new median AND its band.
            if abs(n / norm - o) > band(old, q) + band(new, q) / norm:
                movers.append((ratio, q, o, n))
    if not movers:
        print(f"movers beyond {args.threshold}x normalized AND outside the "
              "combined spread band: NONE")
    else:
        print(f"movers (normalized ratio, outside spread band):")
        for ratio, q, o, n in sorted(movers, reverse=True):
            print(f"  {ratio:5.2f}x  {q}: {o:.3f}s -> {n:.3f}s")


if __name__ == "__main__":
    main()

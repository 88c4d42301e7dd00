#!/usr/bin/env python
"""Dev tool: plan-quality audit for any catalog workload.

Usage: python scripts/explain_workload.py <workload> [sf_dir] [--full]

Prints the audit_plan summary (pushdown, pruning, exchange/broadcast
counts, red flags) and, with --full, the formatted physical plan.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    full = "--full" in sys.argv
    if not args:
        raise SystemExit(__doc__)
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"

    from datafusion_sqlgen_spark import get_spark
    from datafusion_sqlgen_spark.plans.audit import audit_plan
    from datafusion_sqlgen_spark.workloads import build_queries

    spark = get_spark(app_name="explain-workload", cpus=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = build_queries()
    if name not in queries:
        raise SystemExit(f"unknown workload {name!r}; "
                         f"{len(queries)} available")
    a = audit_plan(queries[name](spark, sf_dir))
    print(f"workload            {name}")
    print(f"shuffle exchanges   {a.n_exchanges}")
    print(f"broadcast exchanges {a.n_broadcasts}")
    print(f"broadcast joins     {a.n_broadcast_joins}")
    print(f"sort-merge joins    {a.n_sort_merge_joins}")
    print(f"nested-loop joins   {a.n_nested_loop_joins}")
    print(f"cartesian product   {a.has_cartesian}")
    print(f"python eval         {a.has_python_eval}")
    print(f"whole-stage codegen {a.has_whole_stage_codegen}")
    for f in a.pushed_filters:
        print(f"pushed filters      {f}")
    for r in a.read_schemas:
        print(f"read schema         {r[:100]}")
    for w in a.warnings:
        print(f"WARNING             {w}")
    if full:
        print("\n" + a.plan_text)


if __name__ == "__main__":
    main()

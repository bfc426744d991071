#!/usr/bin/env python3
"""Physical-plan audit across the whole catalog.

For every `queries()` entry, print one line of the plan properties that
decide 100 TB viability: join strategies, exchange count, Python
evaluation, Generate nodes, and scan column pruning. Run after adding
or changing operators to catch plan regressions the value-gate cannot
see (a correct-but-cartesian plan hashes identically).

    python3 tools/audit_plans.py [sf_dir]          # table to stdout
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as E
    from dazzleduck_sql_duckdb_spark.session import get_spark

    spark = get_spark(app_name="plan_audit")
    qs = E.queries()
    hdr = f"{'query':38} {'joins':28} {'exch':>4} {'py':>3} {'gen':>3}  scans(read cols)"
    print(hdr)
    print("-" * len(hdr))
    flagged = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            p = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # pragma: no cover - audit tool
            print(f"{name:38} ERROR {type(ex).__name__}")
            continue
        joins = [m.group(1) for m in JOIN_RE.finditer(p)]
        jshort = ",".join(
            f"{k}x{joins.count(k)}"
            for k in dict.fromkeys(joins)
        ).replace("BroadcastHashJoin", "BHJ").replace(
            "SortMergeJoin", "SMJ"
        ).replace("ShuffledHashJoin", "SHJ").replace(
            "BroadcastNestedLoopJoin", "BNLJ"
        ).replace("CartesianProduct", "CARTESIAN")
        n_exch = p.count("Exchange ")
        py = "Y" if "EvalPython" in p or "ArrowEvalPython" in p or "MapInPandas" in p else "-"
        gen = "Y" if "Generate" in p else "-"
        reads = [
            len(m.group(1).split(","))
            for m in re.finditer(r"ReadSchema: struct<([^>]*)>", p)
        ]
        scans = "+".join(str(r) for r in reads) or "-"
        print(f"{name:38} {jshort or '-':28} {n_exch:>4} {py:>3} {gen:>3}  {scans}")
        if "CartesianProduct" in p:
            flagged.append((name, "CartesianProduct"))
    if flagged:
        print("\nFLAGGED:")
        for name, why in flagged:
            print(f"  {name}: {why}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Stress reproduction for the r9 red gate `remote_scan_dsv2_split_dec`.

The entry passes in isolation but failed the driver's hash gate once
under the full-catalog shared session (CORRECTNESS_r09: rows/schema
match, hash mismatch). Hypotheses (VERDICT r9): a torn split stream
silently merged as a short partial, or shared local-server state
across the 50-entry run. This script runs the entry N times inside
ONE busy session — interleaved with the other shim/remote entries so
the local server and JVM connection pool stay hot — and compares
values against the DuckDB oracle each iteration, dumping both sides
on the first mismatch.

Usage: python tools/stress_split_dec.py [sf_dir] [iterations]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_parity import duck_connect, norm_rows  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    qs = E.queries()
    osql = E.oracle_sql()
    con = duck_connect(sf_dir)

    target = "remote_scan_dsv2_split_dec"
    # background entries that share the local server / connection pool
    noise = [
        "remote_scan_dsv2",
        "remote_scan_split_agg",
        "remote_agg_pushdown",
        "remote_splits_plan",
    ]
    ocols_rows = con.sql(osql[target])
    want_cols, want = norm_rows(
        [d[0] for d in ocols_rows.description], ocols_rows.fetchall()
    )

    fails = 0
    for it in range(iters):
        for n in noise:
            qs[n](spark, sf_dir).collect()
        sdf = qs[target](spark, sf_dir)
        got_cols, got = norm_rows(
            sdf.columns, [tuple(r) for r in sdf.collect()]
        )
        ok = got_cols == want_cols and got == want
        print(f"iter {it}: {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            fails += 1
            print("  spark:", got)
            print("  oracle:", want)
    print(f"done: {fails}/{iters} mismatches")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

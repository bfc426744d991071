"""Heavier reproduction harness for the r9 split_dec hash mismatch:
replicate the driver's shape — ONE shared session running the entire
gate window in catalog order at sf0.01 — and check the target entry
against its oracle after each full pass.

Usage: python tools/stress_full_gate.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_parity import duck_connect, norm_rows  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E
    from dazzleduck_sql_duckdb_spark.plans import queries as Q

    qs = E.queries()
    osql = E.oracle_sql()
    con = duck_connect(sf_dir)

    target = "remote_scan_dsv2_split_dec"
    ocur = con.sql(osql[target])
    want_cols, want = norm_rows(
        [d[0] for d in ocur.description], ocur.fetchall()
    )

    fails = 0
    for p in range(passes):
        for name in Q._GATE_WINDOW:
            t0 = time.time()
            try:
                df = qs[name](spark, sf_dir)
                rows = df.collect()
            except Exception as e:
                print(f"pass {p} {name}: ERROR {str(e)[:200]}", flush=True)
                continue
            if name == target:
                got_cols, got = norm_rows(
                    df.columns, [tuple(r) for r in rows]
                )
                ok = got_cols == want_cols and got == want
                print(
                    f"pass {p} {name}: "
                    f"{'OK' if ok else 'MISMATCH'} "
                    f"({time.time()-t0:.1f}s)",
                    flush=True,
                )
                if not ok:
                    fails += 1
                    print("  spark:", got, flush=True)
                    print("  oracle:", want, flush=True)
            else:
                print(
                    f"pass {p} {name}: {len(rows)} rows "
                    f"({time.time()-t0:.1f}s)",
                    flush=True,
                )
    print(f"done: {fails}/{passes} target mismatches", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

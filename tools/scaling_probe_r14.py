#!/usr/bin/env python3
"""Round-14 scaling-signal artifact (r13 verdict "next round" #7).

At sf0.1 every bench query is scheduling/floor-bound, so the driver's
8-vs-32-core block cannot show parallel scaling (50/53 queries ran
FASTER on 8 cores in r13). This one-off probe builds a larger synthetic
corpus — sf0.1 replicated K times with key offsets, written as many
row groups so scans parallelize — and times a handful of compute-heavy
queries at 8 and at 32 cores in fresh subprocesses, demonstrating that
the engine's operators DO scale with cores once there is enough work
per query. bench.py and its contract are untouched; this writes
plans/r14/SCALING_r14.json only.

Usage:  python3 tools/scaling_probe_r14.py [K=10]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = "/root/testdata/sf0.1"
OUT_DIR = "/tmp/spark_graft_scaling"
QUERIES = [
    "text_fingerprint",
    "text_token_stats",
    "text_langid",
    "q1_pricing_summary",
    "lineitem_full_scan",
    "q6_revenue",
    "dedup_minhash_lsh",
]
# tables those queries read
TABLES = {"documents": "doc_id", "lineitem": "l_orderkey"}

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import __spark_entry__ as E
from dazzleduck_sql_duckdb_spark.session import get_spark

sf_dir = %(out)r
spark = get_spark(app_name="scaling_probe")
queries = E.queries()
names = %(queries)r
# warm passes (JIT/codegen), then median of 3 — bench.py discipline
for _ in range(2):
    for n in names:
        queries[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
runs = []
for _ in range(3):
    t = {}
    for n in names:
        t0 = time.perf_counter()
        queries[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t[n] = time.perf_counter() - t0
        spark.catalog.clearCache()
    runs.append(t)
out = {n: round(sorted(r[n] for r in runs)[1], 4) for n in names}
print("SCALING_JSON " + json.dumps(out))
"""


def build_corpus(k: int) -> None:
    from pyspark.sql import functions as F

    from dazzleduck_sql_duckdb_spark.session import get_spark

    shutil.rmtree(OUT_DIR, ignore_errors=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="scaling_corpus_build")
    for table, key in TABLES.items():
        base = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
        parts = [
            base.withColumn(
                key, F.col(key) + F.lit(i * 100_000_000).cast("long")
            )
            for i in range(k)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        # 64 output files -> >= 64 row groups, so an 8- or 32-core scan
        # actually parallelizes (the sf0.1 originals are single-row-
        # group files, which is the very reason the bench can't show
        # core scaling)
        (df.repartition(64, key).write.mode("overwrite")
         .parquet(os.path.join(OUT_DIR, f"{table}.parquet")))
    spark.stop()


def run_at(cpus: int) -> dict[str, float]:
    code = RUNNER % {"repo": REPO, "out": OUT_DIR, "queries": QUERIES}
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("SCALING_JSON "):
            return json.loads(line[len("SCALING_JSON "):])
    raise RuntimeError(
        f"runner at {cpus} cpus produced no result:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-2000:]}"
    )


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    build_corpus(k)
    t8 = run_at(8)
    t32 = run_at(32)
    record = {
        "k_replication_of_sf0.1": k,
        "tables": sorted(TABLES),
        "row_groups_per_table": 64,
        "cpus_low": 8,
        "cpus_high": 32,
        "seconds_low": t8,
        "seconds_high": t32,
        "ratio_low_over_high": {
            n: round(t8[n] / t32[n], 2) for n in QUERIES
        },
        "methodology": (
            "fresh subprocess per core count (master local[N] via "
            "SPARK_GRAFT_CPUS, same as bench.py), 2 untimed warm "
            "passes, median of 3 timed noop-sink runs per query"
        ),
    }
    path = os.path.join(REPO, "plans", "r14", "SCALING_r14.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=2, sort_keys=True)
    print(json.dumps(record["ratio_low_over_high"], indent=2))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Phase/job profile of the MinHash -> components -> canonical path.

Measure-first probe (guide §1): one warm session, per-phase wall plus
Spark job counts (statusTracker), repeated; medians printed. Run on a
quiet machine.

    python3 tools/probe_minhash.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402
from dazzleduck_sql_duckdb_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = get_spark(app_name="probe_minhash")
    sc = spark.sparkContext
    queries = E.queries()
    # stage views, warm codegen/python workers
    for name in ("dedup_minhash_lsh", "dedup_components",
                 "dedup_canonical_corpus"):
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        spark.catalog.clearCache()

    from pyspark.sql import functions as F

    from dazzleduck_sql_duckdb_spark.operators.components import (
        connected_components,
    )
    from dazzleduck_sql_duckdb_spark.operators.dedup import (
        make_shingle_sig_udf, minhash_neardup_pairs,
    )
    from dazzleduck_sql_duckdb_spark.plans.queries import (
        BANDS, JACCARD_PCT, MINHASH_A, MINHASH_B, SHINGLE_N,
    )

    def jobs_of(fn):
        before = max(sc.statusTracker().getJobIdsForGroup(None) or [-1])
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        after = max(sc.statusTracker().getJobIdsForGroup(None) or [-1])
        return dt, after - before, out

    phases: dict[str, list] = {}

    def rec(name, dt, nj):
        phases.setdefault(name, []).append((dt, nj))

    for _ in range(reps):
        docs = spark.table("documents")
        n_par = sc.defaultParallelism
        kernel = make_shingle_sig_udf(
            MINHASH_A, MINHASH_B, SHINGLE_N, bands=BANDS)
        wide = docs.repartition(n_par, "doc_id")
        staged = wide.select(
            F.col("doc_id"), F.col("lang").alias("blk"),
            kernel(F.col("text")).alias("k"),
        ).select("doc_id", "blk", F.col("k.sh").alias("sh"),
                 F.col("k.bkeys").alias("bkeys"))

        # A: kernel materialization, no cache
        dt, nj, _ = jobs_of(lambda: staged.write.format("noop")
                            .mode("overwrite").save())
        rec("A kernel noop (no cache)", dt, nj)

        # B: kernel materialization into a persist
        st2 = staged.persist()
        dt, nj, _ = jobs_of(lambda: st2.write.format("noop")
                            .mode("overwrite").save())
        rec("B kernel noop (persist write)", dt, nj)
        # B2: re-read from the cache
        dt, nj, _ = jobs_of(lambda: st2.write.format("noop")
                            .mode("overwrite").save())
        rec("B2 cache re-read noop", dt, nj)
        st2.unpersist()
        spark.catalog.clearCache()

        # C: full minhash pipeline (eager localCheckpoint)
        dt, nj, pairs = jobs_of(lambda: minhash_neardup_pairs(
            docs, shingle_n=SHINGLE_N, a=MINHASH_A, b=MINHASH_B,
            bands=BANDS, threshold_pct=JACCARD_PCT))
        rec("C minhash_neardup_pairs() call", dt, nj)

        # D: bench consumer noop over the checkpointed pairs
        dt, nj, _ = jobs_of(lambda: pairs.write.format("noop")
                            .mode("overwrite").save())
        rec("D pairs noop (checkpoint re-read)", dt, nj)

        # E: components over the pairs
        dt, nj, comp = jobs_of(lambda: connected_components(
            pairs, "doc_a", "doc_b", edges_distinct=True))
        rec("E connected_components() call", dt, nj)
        dt, nj, _ = jobs_of(lambda: comp.write.format("noop")
                            .mode("overwrite").save())
        rec("F components noop", dt, nj)
        spark.catalog.clearCache()

        # G: whole bench entries, for reference
        for name in ("dedup_minhash_lsh", "dedup_components",
                     "dedup_canonical_corpus"):
            dt, nj, _ = jobs_of(
                lambda: queries[name](spark, sf_dir)
                .write.format("noop").mode("overwrite").save())
            rec("G " + name, dt, nj)
            spark.catalog.clearCache()

    for name, vals in phases.items():
        med = statistics.median(v[0] for v in vals)
        jn = statistics.median(v[1] for v in vals)
        print(f"{med:7.3f}s  jobs={jn:4.0f}  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

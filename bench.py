#!/usr/bin/env python3
"""Benchmark harness: run the headline query catalog and print ONE JSON line.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python3 bench.py

Prints {"metric": "total_wall_s", "value": N, "unit": "sec",
        "queries": {name: sec, ...}, "sf": 0.1}.

Each query is forced to full execution with a `noop` write (runs the
whole distributed plan, materializes nothing on the driver — the same
discipline you'd use benchmarking on a real cluster). One untimed
warmup query amortizes JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from dazzleduck_sql_duckdb_spark.session import get_spark

# Headline set: the reference's 8-query lineitem suite + TPC-H Q1/Q6
# shapes + the heaviest relational / dedup / embedding / text operators.
BENCH_QUERIES = [
    "lineitem_count",
    "lineitem_sum_orderkey",
    "lineitem_full_scan",
    "lineitem_point_filter",
    "lineitem_projection",
    "lineitem_range_filter",
    "lineitem_date_filter_count",
    "q6_revenue",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_volume",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_quantity",
    "q18_large_volume",
    "q21_suppliers_waiting",
    "q22_sales_opportunity",
    "orders_group_agg",
    "join_region_rollup",
    "window_topk_per_group",
    "events_sessionize",
    "events_hourly_rollup",
    "events_funnel",
    "orders_running_totals",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_components",
    "dedup_canonical_corpus",
    "dedup_exact_substring",
    "embed_knn_bruteforce",
    "text_langid",
    "text_quality",
    "text_token_stats",
    "text_fingerprint",
    "text_normalize",
    "corpus_top_terms",
    "text_tfidf_topk",
    "text_repetition",
    "text_perplexity",
    "text_perplexity_bigram",
    "docs_length_quantiles",
    "sketch_distinct_bounds",
    "sketch_quantile_bounds",
    "docs_shard_assignment",
    "cross_source_contamination",
    "layout_zorder",
]


def run_spark_bench(sf_dir: str, spark=None) -> dict[str, float]:
    """Run the headline set once, fully executed via noop writes; return
    {query: seconds}. Shared by the CLI below and tools/bench_report.py
    so every harness times the identical discipline."""
    if spark is None:
        spark = get_spark(app_name="dazzleduck_bench")
    spark.conf.set("spark.sql.parquet.filterPushdown", "true")

    queries = E.queries()
    names = [n for n in BENCH_QUERIES if n in queries]

    # warmup: pay one-time JVM/codegen/parquet-footer costs AND Python
    # worker fork+import costs (long-lived on a real cluster) before
    # any timed query
    queries["lineitem_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _warm(s):
        return s

    spark.range(0, 1000, 1, 32).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    # catalog-wide untimed warm passes: every timed query's FIRST
    # execution pays its Janino whole-stage-codegen compile (~0.3-1.5s
    # measured at sf0.1, landing on whichever query runs first after a
    # cache miss) — a constant that long-lived cluster executors
    # amortize away. TWO passes, not one: the r12 interleaved A/B
    # (tools/bench_ab.py, BENCH_AB.md) measured the full headline set
    # still dropping through sweeps 2-3 after a single warm pass
    # (19.4s -> 16.9s -> 16.8s -> 15.7s, then FLAT to 0.8% across
    # sweeps 4-6) — HotSpot C2 tiers keep recompiling hot loops for
    # ~3 full passes. With two untimed passes the three timed runs all
    # land in the steady-state window instead of straddling the JIT
    # ramp, which both lowers the median and removes the largest
    # machine-visible variance term. Needs
    # spark.sql.codegen.cache.maxEntries sized to the catalog
    # (session.py) or the warm pass self-evicts.
    for _ in range(2):
        for name in names:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()

    # Timed discipline: MEDIAN OF 3 post-warm runs per query — the
    # symmetric twin of the DuckDB baseline's median-of-3 (a single
    # post-warm run, as earlier rounds used, leaves each number exposed
    # to one GC pause / scheduler hiccup). The warm pass above also
    # pre-warms the OS page cache for all inputs, so both engines are
    # measured steady-state over cached files; BENCH_REPORT.md states
    # this methodology next to the numbers.
    runs: list[dict[str, float]] = []
    for _ in range(3):
        timings: dict[str, float] = {}
        for name in names:
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = time.perf_counter() - t0
            # cache hygiene between queries: every query re-stages its
            # own persisted views, so nothing is shared across entries —
            # but leftover blocks (persisted stage views, and the
            # iterative pipelines' localCheckpoint RDDs) fill the
            # storage pool and can evict a LATER query's stage mid-run,
            # silently recomputing it (observed: 3-15x inflation on the
            # post-dedup text queries in one long session). Drop caches
            # outside the timed region, and nudge the JVM to let
            # ContextCleaner release checkpoint blocks after the
            # checkpointing pipelines.
            spark.catalog.clearCache()
            if name in ("dedup_components", "dedup_canonical_corpus"):
                spark.sparkContext._jvm.System.gc()
        runs.append(timings)
    return {
        name: round(sorted(r[name] for r in runs)[1], 4) for name in names
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    timings = run_spark_bench(sf_dir)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_wall_s",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Interleaved old/new A/B for a Spark-side query rewrite.

The round-13/14 measurement discipline: this host's wall-clock drifts
20-30% with external load and reboots, so sequential before/after
blocks lie. This harness alternates OLD and NEW per repetition inside
ONE warm session (so both arms see the same machine state), times the
noop-sink execution, and reports per-arm medians.

Usage:
    python3 tools/ab_sql.py <query_name> <old_sql_file> <new_sql_file> \
        [sf_dir] [reps]

<query_name> is used only to stage the catalog views/stages the SQL
needs (its builder runs once, untimed, before the A/B).
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


def time_df(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    name = sys.argv[1]
    old_sql = open(sys.argv[2]).read()
    new_sql = open(sys.argv[3]).read()
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 7

    spark = get_spark(app_name=f"ab_{name}")
    queries = E.queries()
    # stage views + any SPARK_STAGES builders, untimed
    queries[name](spark, sf_dir)

    # correctness first: identical sorted rows
    old_rows = sorted(map(repr, spark.sql(old_sql).collect()))
    new_rows = sorted(map(repr, spark.sql(new_sql).collect()))
    assert old_rows == new_rows, (
        f"A/B arms differ: {len(old_rows)} vs {len(new_rows)} rows; "
        f"first diff: "
        f"{next((a, b) for a, b in zip(old_rows, new_rows) if a != b)}"
    )
    print(f"rows identical: {len(old_rows)}")

    # warm both arms (codegen/JIT), untimed
    for _ in range(2):
        time_df(spark.sql(old_sql))
        time_df(spark.sql(new_sql))

    olds, news = [], []
    for i in range(reps):
        if i % 2 == 0:
            olds.append(time_df(spark.sql(old_sql)))
            news.append(time_df(spark.sql(new_sql)))
        else:
            news.append(time_df(spark.sql(new_sql)))
            olds.append(time_df(spark.sql(old_sql)))
    mo, mn = statistics.median(olds), statistics.median(news)
    print(f"old: median {mo:.3f}s  {sorted(round(x, 3) for x in olds)}")
    print(f"new: median {mn:.3f}s  {sorted(round(x, 3) for x in news)}")
    print(f"ratio new/old: {mn / mo:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

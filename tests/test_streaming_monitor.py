"""Streaming quality monitor: stream==batch on the exact columns, the
GK rank contract on the sketch columns, watermark eviction, and a
DuckDB differential for the batch form.

The sketch columns (p50/p95) deliberately get a RANK-BOUND assertion
rather than bit-equality: micro-batch sequential merge and batch
partition merge compress the GK summary in different orders, and the
bound is the semantics percentile_approx actually promises (the same
two-sided tie-safe form the driver-gated `sketch_quantile_bounds`
entry uses).
"""

from __future__ import annotations

import datetime as dt
import os
import time

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dazzleduck_sql_duckdb_spark.streaming import (
    quality_monitor,
    read_events_stream,
    run_stream_to_memory,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
N_FILES = 4
_HOUR_US = 3_600_000_000


@pytest.fixture(scope="module")
def chunked_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_monitor_chunks")
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    t = t.sort_by("ts")
    n = t.num_rows
    step = (n + N_FILES - 1) // N_FILES
    now = time.time()
    for i in range(N_FILES):
        path = str(d / f"part-{i}.parquet")
        pq.write_table(t.slice(i * step, step), path)
        os.utime(path, (now + i, now + i))
    return str(d)


def _key(r):
    return (r["window_start_us"], r["event_type"])


def test_multibatch_monitor_stream_vs_batch(spark, chunked_events_dir):
    batch_df = spark.read.parquet(chunked_events_dir)
    stream = quality_monitor(
        read_events_stream(spark, chunked_events_dir, max_files_per_trigger=1)
    )
    run_stream_to_memory(stream, "mon_stream")
    got = {_key(r): r for r in spark.table("mon_stream").collect()}
    want = {_key(r): r for r in quality_monitor(batch_df).collect()}
    assert set(got) == set(want) and len(got) > 0

    # exact columns: bit-equal between stream and batch
    for k in want:
        for col in ("n", "sum_value", "min_value", "max_value"):
            assert got[k][col] == want[k][col], (k, col)

    # sketch columns: the GK rank bound against the group's raw values
    rows = batch_df.select("ts", "event_type", "value").collect()
    groups: dict[tuple, list[float]] = {}
    for r in rows:
        ts = r["ts"]
        if isinstance(ts, dt.datetime):
            us = int(
                ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
            )
        else:
            us = int(ts)
        k = (us - us % _HOUR_US, r["event_type"])
        groups.setdefault(k, []).append(float(r["value"]))
    assert set(groups) == set(got)
    for k, vals in groups.items():
        n = len(vals)
        for col, frac, eps in (("p50", 0.5, 0.02), ("p95", 0.95, 0.02)):
            est = got[k][col]
            below = sum(1 for v in vals if v < est)
            at_or_below = sum(1 for v in vals if v <= est)
            assert below <= (frac + eps) * n + 1, (k, col, est)
            assert at_or_below >= (frac - eps) * n - 1, (k, col, est)


def test_monitor_batch_matches_duckdb(spark):
    got = {
        _key(r): r
        for r in quality_monitor(
            spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        ).collect()
    }
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT (epoch_us(ts) - epoch_us(ts) % {_HOUR_US}) AS w,
          event_type, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS s,
          min(value) AS mn, max(value) AS mx
        FROM '{os.path.join(SF_DIR, "events.parquet")}'
        GROUP BY 1, 2
        """
    ).fetchall()
    con.close()
    assert len(want) == len(got) > 0
    for w, et, n, s, mn, mx in want:
        r = got[(w, et)]
        assert (r["n"], r["sum_value"], r["min_value"], r["max_value"]) == (
            n, s, mn, mx
        ), (w, et)


def _chunk(path: str, minutes: list[int], values: list[float], mtime: float):
    base = dt.datetime(2024, 1, 1)
    t = pa.table(
        {
            "event_id": pa.array(range(len(minutes)), pa.int64()),
            "user_id": pa.array([1] * len(minutes), pa.int64()),
            "event_type": pa.array(["view"] * len(minutes), pa.string()),
            "ts": pa.array(
                [base + dt.timedelta(minutes=m) for m in minutes],
                pa.timestamp("us"),
            ),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * len(minutes), pa.string()),
        }
    )
    pq.write_table(t, path)
    os.utime(path, (mtime, mtime))


def test_monitor_append_evicts_then_drops_late_row(spark, tmp_path):
    d = str(tmp_path)
    base_us = int(
        dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1e6
    )
    now = time.time()
    # batch 0: three hour-0 rows + one 02:30 row -> watermark 01:30
    _chunk(f"{d}/part-0.parquet", [5, 20, 40, 150], [1.0, 2.0, 9.0, 5.0], now)
    # batch 1: hour-0 window (end 01:00) < watermark -> emitted + evicted
    _chunk(f"{d}/part-1.parquet", [270], [5.0], now + 10)
    # batch 2: late 00:15 row for the evicted window -> dropped
    _chunk(f"{d}/part-2.parquet", [15, 285], [100.0, 5.0], now + 20)
    stream = quality_monitor(
        read_events_stream(spark, d, max_files_per_trigger=1)
    )
    run_stream_to_memory(stream, "mon_late", output_mode="append")
    by_hour: dict[int, list] = {}
    for r in spark.table("mon_late").collect():
        by_hour.setdefault(r["window_start_us"], []).append(r)
    # hour 0 emitted exactly once with the 3 on-time rows; the late
    # 100.0 value never contaminated its percentiles
    assert len(by_hour[base_us]) == 1
    r0 = by_hour[base_us][0]
    assert r0["n"] == 3 and r0["max_value"] == 9.0
    assert r0["p50"] in (1.0, 2.0, 9.0) and r0["p50"] <= 9.0


def test_custom_frac_column_naming_rounds(spark):
    """p-column names must round, not truncate: int(0.29*100) == 28
    under float representation, mislabeling the column p28."""
    df = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    cols = quality_monitor(df, fracs=(0.29, 0.5, 0.95)).columns
    assert "p29" in cols and "p28" not in cols
    assert "p50" in cols and "p95" in cols

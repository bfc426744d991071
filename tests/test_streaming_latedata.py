"""Watermark late-data semantics: the bounded-state contract, asserted
positively.  Spark's guarantee is one-directional: rows within the
watermark are never dropped; a late row may still merge into a window
whose state happens to be open.  The hard contract — what makes state
O(watermark x rate) instead of O(stream length) — is EVICTION: once the
watermark passes a window's end the window is emitted exactly once, its
state is freed, and a row arriving after that is dropped rather than
resurrecting the window (which would emit a duplicate append row
downstream).  This test drives three ordered micro-batches to observe
exactly that: close a window, then deliver a row for it.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dazzleduck_sql_duckdb_spark.streaming import (
    hourly_rollup,
    read_events_stream,
    run_stream_to_memory,
)

_BASE = dt.datetime(2024, 1, 1)
_BASE_US = int(_BASE.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
_HOUR_US = 3_600_000_000


def _chunk(path: str, minutes: list[int], mtime: float) -> None:
    t = pa.table(
        {
            "event_id": pa.array(range(len(minutes)), pa.int64()),
            "user_id": pa.array([1] * len(minutes), pa.int64()),
            "event_type": pa.array(["view"] * len(minutes), pa.string()),
            "ts": pa.array(
                [_BASE + dt.timedelta(minutes=m) for m in minutes],
                pa.timestamp("us"),
            ),
            "value": pa.array([1.0] * len(minutes), pa.float64()),
            "props": pa.array(["{}"] * len(minutes), pa.string()),
        }
    )
    pq.write_table(t, path)
    os.utime(path, (mtime, mtime))


@pytest.fixture(scope="module")
def late_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_late")
    now = time.time()
    # batch 0: three hour-0 views + one at 02:30; watermark after this
    # batch = 02:30 - 1h = 01:30
    _chunk(str(d / "part-0.parquet"), [5, 20, 40, 150], now)
    # batch 1: processed under watermark 01:30, which passes hour-0's
    # window end (01:00): the window emits n=3 and its state is evicted;
    # the 04:30 event advances the watermark to 03:30 for batch 2
    _chunk(str(d / "part-1.parquet"), [270], now + 10)
    # batch 2: a 00:15 row for the ALREADY-EVICTED hour-0 window — must
    # be dropped, not resurrect the window (a duplicate hour-0 append
    # row downstream would double-count); plus an on-time 04:45 row
    _chunk(str(d / "part-2.parquet"), [15, 285], now + 20)
    return str(d)


def test_append_rollup_evicts_then_drops_late_row(spark, late_dir):
    stream = hourly_rollup(
        read_events_stream(spark, late_dir, max_files_per_trigger=1)
    )
    run_stream_to_memory(stream, "late_rollup", output_mode="append")
    rows = spark.table("late_rollup").collect()
    by_hour: dict[int, list[int]] = {}
    for r in rows:
        by_hour.setdefault(r["hour_start_us"], []).append(r["n"])
    # hour 0 emitted EXACTLY ONCE with the 3 on-time views; the late
    # 00:15 row arrived after eviction and was dropped
    assert by_hour[_BASE_US] == [3]
    # hour 2 closed by the batch-2 watermark (03:30 > 03:00)
    assert by_hour[_BASE_US + 2 * _HOUR_US] == [1]
    # hour 4's window end (05:00) never passed the final watermark ->
    # still open at availableNow termination, not emitted in append
    assert _BASE_US + 4 * _HOUR_US not in by_hour

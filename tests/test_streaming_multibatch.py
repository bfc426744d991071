"""Multi-micro-batch streaming == batch differentials.

The single-directory tests in test_streaming.py drain everything in
ONE micro-batch, which never exercises the state machinery: sessions
merging across batch boundaries, stream-stream join buffers holding a
side until the other arrives, watermark advancing between batches.
Here the events are time-sorted and split into four contiguous-range
files, and ``maxFilesPerTrigger=1`` forces the availableNow trigger to
process them as four ordered micro-batches (file mtimes are staggered;
the file source picks oldest first).  Contiguous ranges mean nothing
is ever later than the watermark allows, so streaming must equal batch
exactly — any lost/duplicated row is a state-management bug, not late
data.
"""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq
import pytest

from dazzleduck_sql_duckdb_spark.streaming import (
    hourly_rollup,
    read_events_stream,
    run_stream_to_memory,
    sessionize,
    view_click_attribution,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
N_FILES = 4


@pytest.fixture(scope="module")
def chunked_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream_chunks")
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    t = t.sort_by("ts")
    n = t.num_rows
    step = (n + N_FILES - 1) // N_FILES
    now = time.time()
    for i in range(N_FILES):
        path = str(d / f"part-{i}.parquet")
        pq.write_table(t.slice(i * step, step), path)
        # stagger mtimes so the file source's oldest-first ordering
        # matches the time order of the chunks
        os.utime(path, (now + i, now + i))
    return str(d)


@pytest.fixture(scope="module")
def batch_events(spark, chunked_events_dir):
    return spark.read.parquet(chunked_events_dir)


def _rows(df_or_rows):
    rows = (
        df_or_rows.collect() if hasattr(df_or_rows, "collect") else df_or_rows
    )
    return sorted(tuple(r) for r in rows)


def _stream(spark, d):
    s = read_events_stream(spark, d, max_files_per_trigger=1)
    assert s.isStreaming
    return s


def test_multibatch_hourly_rollup(spark, chunked_events_dir, batch_events):
    run_stream_to_memory(
        hourly_rollup(_stream(spark, chunked_events_dir)), "mb_rollup"
    )
    got = _rows(spark.table("mb_rollup"))
    want = _rows(hourly_rollup(batch_events))
    assert got == want and len(got) > 0


def test_multibatch_sessionize(spark, chunked_events_dir, batch_events):
    """Sessions whose events straddle a file boundary must be merged by
    the session-window state store across micro-batches."""
    run_stream_to_memory(
        sessionize(_stream(spark, chunked_events_dir)), "mb_sessions"
    )
    got = _rows(spark.table("mb_sessions"))
    want = _rows(sessionize(batch_events))
    assert got == want and len(got) > 0


def test_multibatch_attribution_join(spark, chunked_events_dir, batch_events):
    """A view in batch k joined to a click in batch k+1 requires the
    join buffer to hold the view across the boundary until the click
    arrives (and the final availableNow watermark flush to emit it)."""
    run_stream_to_memory(
        view_click_attribution(_stream(spark, chunked_events_dir)),
        "mb_attr",
        output_mode="append",
    )
    got = _rows(spark.table("mb_attr"))
    want = _rows(view_click_attribution(batch_events))
    assert got == want and len(got) > 0

"""Streaming == batch differential tests for the event-pipeline operators."""

from __future__ import annotations

import os
import shutil

import pytest

from dazzleduck_sql_duckdb_spark.streaming import (
    hourly_rollup,
    read_events_stream,
    run_stream_to_memory,
    sessionize,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """File-source streams need a directory; stage the events parquet
    into one (split into two files to exercise multi-batch discovery)."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "part-0.parquet")
    return str(d)


@pytest.fixture(scope="module")
def batch_events(spark, events_dir):
    return spark.read.parquet(events_dir)


def _rows(df_or_rows):
    rows = df_or_rows.collect() if hasattr(df_or_rows, "collect") else df_or_rows
    return sorted(tuple(r) for r in rows)


def test_hourly_rollup_stream_equals_batch(spark, events_dir, batch_events):
    stream = hourly_rollup(read_events_stream(spark, events_dir))
    assert stream.isStreaming
    run_stream_to_memory(stream, "rollup_mem")
    got = _rows(spark.table("rollup_mem"))
    want = _rows(hourly_rollup(batch_events))
    assert got == want
    assert len(got) > 0


def test_sessionize_stream_equals_batch(spark, events_dir, batch_events):
    stream = sessionize(read_events_stream(spark, events_dir))
    assert stream.isStreaming
    run_stream_to_memory(stream, "sessions_mem")
    got = _rows(spark.table("sessions_mem"))
    want = _rows(sessionize(batch_events))
    assert got == want
    assert len(got) > 0


def test_view_click_attribution_stream_equals_batch(
    spark, events_dir, batch_events
):
    """Stream-stream watermarked join == the same join on batch input.
    Watermarks only bound state here (availableNow processes everything
    before the final watermark advance), so no rows may be lost."""
    from dazzleduck_sql_duckdb_spark.streaming import view_click_attribution

    stream = view_click_attribution(read_events_stream(spark, events_dir))
    assert stream.isStreaming
    run_stream_to_memory(stream, "attr_mem", output_mode="append")
    got = _rows(spark.table("attr_mem"))
    want = _rows(view_click_attribution(batch_events))
    assert got == want
    assert len(got) > 0


def test_session_window_matches_lag_formulation(spark, tables):
    """The native session_window operator must produce the same sessions
    as the catalog's lag+cumsum SQL (same 30-min gap semantics)."""
    from dazzleduck_sql_duckdb_spark.plans import queries as Q

    native = sessionize(spark.table("events"))
    got = _rows(native.select("user_id", "n_events", "start_us", "end_us"))
    lag_rows = spark.sql(Q.spark_sql_for("events_sessionize")).select(
        "user_id", "n_events", "start_us", "end_us"
    )
    assert got == _rows(lag_rows)

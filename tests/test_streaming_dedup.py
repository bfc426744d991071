"""Cross-micro-batch streaming dedup: native and custom-stateful paths."""

from __future__ import annotations

import os

import pytest

from dazzleduck_sql_duckdb_spark.streaming.dedup import (
    dedup_stream,
    first_seen_dedup,
)
from dazzleduck_sql_duckdb_spark.streaming.pipeline import EVENTS_SCHEMA

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def dup_dir(spark, tmp_path_factory):
    """Two parquet files with overlapping rows -> duplicates arrive in
    different micro-batches (maxFilesPerTrigger=1)."""
    d = tmp_path_factory.mktemp("dup_stream")
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    ev.where("event_id % 2 = 0").coalesce(1).write.parquet(str(d / "a"))
    ev.where("event_id % 3 = 0").coalesce(1).write.parquet(str(d / "b"))
    # flatten into one dir
    files = []
    for sub in ("a", "b"):
        for f in os.listdir(d / sub):
            if f.endswith(".parquet"):
                os.rename(d / sub / f, d / f"{sub}.parquet")
    return str(d)


def _stream(spark, path):
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _drain(df, name):
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()


def test_native_dedup_stream(spark, dup_dir):
    out = dedup_stream(_stream(spark, dup_dir), ["event_id"])
    _drain(out, "dedup_native")
    got = spark.table("dedup_native")
    n_distinct = (
        spark.read.parquet(dup_dir).select("event_id").distinct().count()
    )
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_native_dedup_stream_watermarked_keys_only(spark, dup_dir):
    """The watermarked path dedups on the keys ALONE
    (dropDuplicatesWithinWatermark): a key reappearing at a different
    event time within the horizon is still dropped, with state bounded
    by the watermark — NOT keyed on (key, event_time), which would
    re-emit every distinct timestamp."""
    out = dedup_stream(
        _stream(spark, dup_dir), ["event_id"],
        watermark_col="ts", watermark="24 hours",
    )
    assert out.isStreaming
    _drain(out, "dedup_native_wm")
    got = spark.table("dedup_native_wm")
    n_distinct = (
        spark.read.parquet(dup_dir).select("event_id").distinct().count()
    )
    # every key exactly once, even though the same event_id arrives in
    # two files (micro-batches) with identical timestamps and would
    # also arrive at different ts in a (key, ts)-keyed dedup
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_first_seen_custom_stateful(spark, dup_dir):
    out = first_seen_dedup(_stream(spark, dup_dir), "event_id")
    assert out.isStreaming
    _drain(out, "dedup_custom")
    got = {r.event_id for r in spark.table("dedup_custom").collect()}
    want = {
        r.event_id
        for r in spark.read.parquet(dup_dir).select("event_id").distinct().collect()
    }
    assert got == want

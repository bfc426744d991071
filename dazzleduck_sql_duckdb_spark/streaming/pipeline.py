"""Streaming event-pipeline operators (watermarked rollup, sessionization).

Design notes for the 100 TB/day contract:

- State is bounded by the watermark: the hourly rollup keeps at most
  (watermark / window) * |event_type| groups per partition; sessions
  close `gap` after their last event and are evicted.
- The transformations are identical Column expressions in batch and
  streaming — every function here accepts either a batch or a streaming
  DataFrame, which is how the tests prove streaming == batch on the same
  files (run with `availableNow` trigger).
- `ts` arrives as TIMESTAMP_NTZ microseconds (events.parquet is
  TIMESTAMP(MICROS)) and is normalized to a session-timezone timestamp
  column once, up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),  # micros, naive UTC
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events parquet directory (new files are
    discovered per micro-batch; schema must be explicit for streams).

    ``max_files_per_trigger`` caps files per micro-batch — with the
    availableNow trigger the source then processes the directory as a
    SEQUENCE of micro-batches (oldest file first), which is how the
    tests exercise cross-batch state: session merging, join buffering,
    watermark advance."""
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(path)


def with_event_time(df: DataFrame) -> DataFrame:
    # NTZ -> session-tz timestamp is identity on the instant (UTC session)
    return df.withColumn("event_ts", F.expr("CAST(ts AS TIMESTAMP)"))


def hourly_rollup(
    events: DataFrame, *, watermark: str = "1 hour"
) -> DataFrame:
    """Per-hour x event_type counts/sums with late-data tolerance.

    Streaming: watermarked windowed aggregation (append-safe, bounded
    state). Batch: the same expression degrades to a plain GROUP BY.
    """
    df = with_event_time(events)
    if df.isStreaming:
        df = df.withWatermark("event_ts", watermark)
    return (
        df.groupBy(
            F.window("event_ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("hour_start_us"),
            "event_type", "n", "sum_value", "min_value", "max_value",
        )
    )


def sessionize(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based sessions via the native session_window operator.

    Semantics match the lag+cumsum batch formulation (catalog query
    events_sessionize): a session extends while consecutive events are
    within `gap`. Streaming state: one open session per (user, session);
    closed `gap` after the last event past the watermark.
    """
    df = with_event_time(events)
    if df.isStreaming:
        df = df.withWatermark("event_ts", watermark)
    return (
        df.groupBy(
            F.col("user_id"), F.session_window("event_ts", gap).alias("w")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(F.col("event_ts")).alias("first_event_ts"),
            F.max(F.col("event_ts")).alias("last_event_ts"),
        )
        .select(
            "user_id", "n_events",
            F.unix_micros("first_event_ts").alias("start_us"),
            F.unix_micros("last_event_ts").alias("end_us"),
        )
    )


def view_click_attribution(
    events: DataFrame,
    *,
    within_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each view joined to the same user's
    clicks landing in (view_ts, view_ts + within]. Attribution — the
    canonical two-stream correlation.

    Scale/state contract: BOTH sides are watermarked and the join
    condition bounds the event-time range, so Spark's state store
    retains at most `watermark + within` of either stream per user —
    state is O(rate x window), independent of total stream length. The
    same function on batch inputs is the differential oracle.
    """
    base = with_event_time(events)
    views = base.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("event_ts").alias("v_ts"),
    )
    clicks = base.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("event_ts").alias("c_ts"),
    )
    if events.isStreaming:
        views = views.withWatermark("v_ts", watermark)
        clicks = clicks.withWatermark("c_ts", watermark)
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts")
           + F.expr(f"INTERVAL {within_minutes} MINUTES"))
    )
    return views.join(clicks, cond, "inner").select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        F.expr("unix_micros(c_ts) - unix_micros(v_ts)").alias("lag_us"),
    )


def run_stream_to_memory(
    df: DataFrame, name: str, *, timeout_s: int = 120,
    output_mode: str = "complete",
) -> None:
    """Drain a streaming DataFrame into an in-memory table with the
    availableNow trigger (process-everything-then-stop) — the test/demo
    harness for the operators above. Stream-stream joins require
    ``output_mode="append"``."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_s)
    finally:
        q.stop()

"""Streaming pipeline-health monitor: per-window approx-quantile
rollups with bounded state.

The ingest-gate modules (dedup.py, quality.py) decide per document;
this module watches the PIPELINE — per event-time window and event
type it emits counts, exact sum/min/max, and sketch-based p50/p95 of
the value column. The quantile columns are the point: an exact
percentile over a streaming window must buffer EVERY value per open
window in the state store (O(rows) state — the thing that kills a
monitor at 100 TB/day), while percentile_approx keeps a
Greenwald-Khanna summary of O(1/eps) entries per (window, type) group
regardless of traffic. Same sketch-over-exact trade as the batch
`sketch_quantile_bounds` catalog entry, in its streaming deployment
shape.

Accuracy contract (mirrors the batch entry): a GK summary at
`accuracy` a guarantees rank error <= n/a. The stream==batch test
cannot demand bit-equality of the sketch columns — micro-batch
sequential merge and batch partition merge compress in different
orders — so tests/test_streaming_monitor.py pins the RANK bound of
the streamed estimates against batch-exact percentiles (tie-safe
two-sided form), plus bit-equality of the exact columns. That is the
semantics the sketch actually promises, verified the same way the
driver gates `sketch_quantile_bounds`.

Watermark semantics: append-mode windowed aggregation; a window
finalizes `watermark` past its end, later-than-watermark events are
dropped (test-pinned). State per group is one GK summary + 4 scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pipeline import with_event_time


def quality_monitor(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "1 hour",
    fracs: tuple[float, ...] = (0.5, 0.95),
    accuracy: int = 10_000,
) -> DataFrame:
    """Windowed health rollup; identical expression on batch and
    streaming DataFrames (the module's stream==batch discipline).

    Returns one row per (window, event_type): `window_start_us`,
    `event_type`, `n`, `sum_value` (exact decimal), `min_value`,
    `max_value`, and `p<frac>` double columns from percentile_approx.
    """
    df = with_event_time(events)
    if df.isStreaming:
        df = df.withWatermark("event_ts", watermark)
    quant = F.percentile_approx(
        F.col("value").cast("double"), list(fracs), accuracy
    ).alias("q")
    out = (
        df.groupBy(
            F.window("event_ts", window).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .alias("sum_value"),
            F.min(F.col("value").cast("double")).alias("min_value"),
            F.max(F.col("value").cast("double")).alias("max_value"),
            quant,
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value",
            "min_value",
            "max_value",
            *[
                F.col("q")[i].alias(f"p{round(frac * 100)}")
                for i, frac in enumerate(fracs)
            ],
        )
    )
    return out

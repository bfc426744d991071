"""Temporal joins Spark lacks as built-ins: as-of join and interval
(range) join, expressed as shuffle-bounded compositions of DataFrame
ops — no nested-loop / cartesian plans anywhere.

These are engine-added operators (the reference delegates all joins to
its host engine — SURVEY.md §2.4); they exist because a training-data
pipeline over event streams needs point-in-time correctness ("the
latest X as of T") and bounded-window correlation ("events within W of
T") at 100 TB, where a naive inequality join is a BroadcastNestedLoop
disaster.

Scale design:
- ``asof_join`` is ONE shuffle (by key) + ONE window sort: both sides
  are union-tagged and sorted by (key, time), and the payload is
  carried forward with ``last(ignorenulls)``. This is the classic
  distributed as-of algorithm: cost O((|L|+|R|) log) per key,
  independent of match distances. Skewed keys behave like any window
  skew (AQE cannot split a window partition — extremely hot keys
  should be range-bucketed by time first).
- ``range_join_binned`` buckets time into bins at least as wide as the
  join window, so every left interval overlaps at most 2 bins; the
  non-equi predicate becomes an equi-join on (key, bin) followed by an
  exact residual filter. Shuffle volume is |L|·2 + |R| rows — never
  |L|·|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    *,
    left_time: str,
    right_time: str,
) -> DataFrame:
    """Backward as-of LEFT join: for each left row, attach the payload
    of the right row with the greatest ``right_time`` satisfying
    ``right_time <= left_time`` within the same key group (NULLs when
    no such row).

    Payload = every right column that is neither a key nor the time
    column. If several right rows share the maximal (key, time), which
    one wins is unspecified — pre-aggregate the right side to one row
    per (key, time) for deterministic results.

    NULL semantics match SQL ASOF (``right_time <= left_time`` is never
    satisfied by a NULL on either side): right rows with NULL time are
    dropped before the merge — without this they would sort NULLS-FIRST
    ahead of every real row and leak into the carry-forward — and left
    rows with NULL time get NULL payloads (they sort before all
    non-NULL right rows, so nothing precedes them).

    Both time columns must be mutually comparable (use epoch integers
    when the sides store different temporal types).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right = right.where(F.col(right_time).isNotNull())
    payload = [c for c in right.columns if c not in keys and c != right_time]
    carry = [c for c in left.columns if c not in keys]
    if set(carry) & set(payload):
        raise ValueError(f"column collision: {set(carry) & set(payload)}")

    l_tagged = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_l"),
        *[F.col(c) for c in carry],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
    )
    r_tagged = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_l"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in carry],
        *[F.col(c) for c in payload],
    )
    # at equal time the right row sorts first (__is_l 0 < 1), making the
    # match inclusive: right_time == left_time is visible to the left row
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__is_l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *keys,
        "__t",
        "__is_l",
        *[F.col(c) for c in carry],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
    )
    return filled.where(F.col("__is_l") == 1).drop("__is_l", "__t")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    *,
    left_time: str,
    right_time: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """Inner interval join: pairs where
    ``left_time + lower <= right_time <= left_time + upper`` and the
    keys match. Time columns must be integers (e.g. epoch-us); bounds
    are inclusive, ``lower <= upper``.

    Result columns: keys, then non-key left columns, then non-key right
    columns (names must not collide — alias beforehand).
    """
    if lower > upper:
        raise ValueError("lower must be <= upper")
    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    if set(lcols) & set(rcols):
        raise ValueError(f"column collision: {set(lcols) & set(rcols)}")

    width = max(upper - lower + 1, 1)
    lo_bin = F.floor((F.col(left_time) + F.lit(lower)) / F.lit(width))
    hi_bin = F.floor((F.col(left_time) + F.lit(upper)) / F.lit(width))
    # window width == bin width ⇒ hi_bin - lo_bin ∈ {0, 1}: ≤2 rows out
    l_binned = left.withColumn(
        "__bin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    r_binned = right.withColumn(
        "__bin", F.floor(F.col(right_time) / F.lit(width))
    )
    joined = l_binned.join(r_binned, on=[*keys, "__bin"], how="inner")
    return joined.where(
        (F.col(right_time) >= F.col(left_time) + F.lit(lower))
        & (F.col(right_time) <= F.col(left_time) + F.lit(upper))
    ).drop("__bin")

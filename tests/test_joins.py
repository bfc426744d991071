"""As-of join and binned range join: correctness vs naive formulations,
plan-shape guarantees (no nested-loop joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dazzleduck_sql_duckdb_spark.operators.joins import (
    asof_join,
    range_join_binned,
)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    # classic as-of shape: trades pick up the latest quote at-or-before
    trades = spark.createDataFrame(
        [(1, 10, "t-a"), (1, 55, "t-b"), (2, 20, "t-c"), (3, 5, "t-d")],
        "sym INT, t BIGINT, trade STRING",
    )
    quotes = spark.createDataFrame(
        [(1, 10, 100.0), (1, 50, 101.0), (1, 60, 102.0), (2, 25, 200.0)],
        "sym INT, qt BIGINT, px DOUBLE",
    )
    return trades, quotes


def test_asof_backward_inclusive(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(
        trades, quotes, "sym", left_time="t", right_time="qt"
    ).collect()
    got = {r["trade"]: r["px"] for r in out}
    # t-a: quote at the same instant (10) is visible -> 100.0
    # t-b: latest quote <= 55 is 50 -> 101.0 (60 is in the future)
    # t-c: no quote <= 20 for sym 2 -> NULL
    # t-d: sym 3 has no quotes at all -> NULL
    assert got == {"t-a": 100.0, "t-b": 101.0, "t-c": None, "t-d": None}
    assert len(out) == trades.count()  # left join: every trade kept


def test_asof_matches_naive_on_random_data(spark):
    left = spark.range(0, 2000).select(
        (F.col("id") % 17).alias("k"),
        F.xxhash64("id").alias("lt"),
        F.col("id").alias("lid"),
    )
    right = spark.range(0, 1500).select(
        (F.col("id") % 17).alias("k"),
        F.xxhash64("id", F.lit(1)).alias("rt"),
        F.col("id").alias("rid"),
    )
    # right times are distinct per key (xxhash64 collisions aside), so
    # the naive argmax formulation is deterministic
    got = asof_join(left, right, "k", left_time="lt", right_time="rt")
    naive = (
        left.join(right, on="k", how="left")
        .where(F.col("rt") <= F.col("lt"))
        .groupBy("k", "lid", "lt")
        .agg(F.max(F.struct("rt", "rid")).alias("m"))
        .select("k", "lid", "lt", F.col("m.rt").alias("rt"),
                F.col("m.rid").alias("rid"))
    )
    g = {(r["k"], r["lid"]): r["rid"] for r in got.collect()}
    n = {(r["k"], r["lid"]): r["rid"] for r in naive.collect()}
    # naive drops left rows with no match; those must be NULL in ours
    assert len(g) == 2000
    for key, val in n.items():
        assert g[key] == val
    for key in set(g) - set(n):
        assert g[key] is None


def test_asof_plan_has_no_nested_loop(spark, quotes_trades):
    trades, quotes = quotes_trades
    plan = (
        asof_join(trades, quotes, "sym", left_time="t", right_time="qt")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_binned_matches_naive(spark):
    left = spark.range(0, 1200).select(
        (F.col("id") % 7).alias("k"),
        (F.pmod(F.xxhash64("id"), F.lit(10_000))).alias("lt"),
        F.col("id").alias("lid"),
    )
    right = spark.range(0, 900).select(
        (F.col("id") % 7).alias("k"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000))).alias("rt"),
        F.col("id").alias("rid"),
    )
    lower, upper = -250, 250
    got = range_join_binned(
        left, right, "k",
        left_time="lt", right_time="rt", lower=lower, upper=upper,
    )
    naive = left.join(right, "k").where(
        (F.col("rt") >= F.col("lt") + lower)
        & (F.col("rt") <= F.col("lt") + upper)
    )
    gs = sorted((r["lid"], r["rid"]) for r in got.collect())
    ns = sorted((r["lid"], r["rid"]) for r in naive.collect())
    assert gs == ns
    assert len(gs) > 0


def test_range_join_binned_negative_window(spark):
    # strictly-before window (upper < 0), the catalog query's shape
    ev = spark.createDataFrame(
        [(1, 100, 1), (1, 150, 2), (1, 400, 3), (2, 100, 4)],
        "k INT, t BIGINT, eid INT",
    )
    got = range_join_binned(
        ev.select("k", "t", "eid"),
        ev.select("k", F.col("t").alias("pt"), F.col("eid").alias("pid")),
        "k", left_time="t", right_time="pt", lower=-100, upper=-1,
    )
    pairs = sorted((r["eid"], r["pid"]) for r in got.collect())
    # eid 2 sees eid 1 (150-100=50 in [50,149]); eid 3 sees nothing
    # (400-100=300..399 window covers no event); self never matches
    assert pairs == [(2, 1)]


def test_range_join_plan_is_equi_join(spark):
    ev = spark.createDataFrame([(1, 100, 1)], "k INT, t BIGINT, eid INT")
    plan = (
        range_join_binned(
            ev, ev.select("k", F.col("t").alias("pt")), "k",
            left_time="t", right_time="pt", lower=-100, upper=-1,
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_column_collision_raises(spark, quotes_trades):
    trades, quotes = quotes_trades
    with pytest.raises(ValueError, match="collision"):
        asof_join(
            trades,
            quotes.withColumnRenamed("px", "trade"),
            "sym", left_time="t", right_time="qt",
        )
    with pytest.raises(ValueError, match="lower"):
        range_join_binned(
            trades, quotes, "sym",
            left_time="t", right_time="qt", lower=5, upper=1,
        )

"""Salted-join correctness on a pathologically skewed key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # 50k rows of one hot key + a uniform tail
    big = spark.range(0, 50_000).select(
        F.when(F.col("id") < 45_000, F.lit(7)).otherwise(
            F.col("id") % 100
        ).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    return big, small


def test_salted_inner_equals_plain(spark, skewed):
    from dazzleduck_sql_duckdb_spark.operators.skew import salted_join

    big, small = skewed
    got = salted_join(big, small, "k", salt=8)
    want = big.join(small, "k")
    assert got.count() == want.count() == 50_000
    gs = got.groupBy("k").count().collect()
    ws = want.groupBy("k").count().collect()
    assert sorted(map(tuple, gs)) == sorted(map(tuple, ws))
    assert sorted(got.columns) == sorted(want.columns)


def test_salted_left_keeps_unmatched(spark, skewed):
    from dazzleduck_sql_duckdb_spark.operators.skew import salted_join

    big, small = skewed
    small_partial = small.where("k < 50")
    got = salted_join(big, small_partial, "k", salt=8, how="left")
    want = big.join(small_partial, "k", "left")
    assert got.count() == want.count()
    assert (
        got.where("name IS NULL").count()
        == want.where("name IS NULL").count()
    )


def test_salt_actually_spreads_hot_key(spark, skewed):
    from dazzleduck_sql_duckdb_spark.operators.skew import salted_join

    big, small = skewed
    # inspect the salted big side: the hot key must land in >1 salt bucket
    big_s = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.col("k"), F.monotonically_increasing_id()),
            F.lit(8),
        ).cast("int"),
    )
    n_buckets = (
        big_s.where("k = 7").select("__salt").distinct().count()
    )
    assert n_buckets == 8
    # and the join itself is an exchange on (k, __salt), not k alone
    j = salted_join(big, small, "k", salt=8)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_salted_join_with_nested_map_column(spark):
    """A struct/array wrapping a MapType must be excluded from the salt
    hash (xxhash64 rejects maps at any nesting depth) — salted_join on
    such a schema used to fail at plan time."""
    from dazzleduck_sql_duckdb_spark.operators.skew import salted_join

    big = spark.range(0, 200).select(
        (F.col("id") % 10).alias("k"),
        F.struct(
            F.col("id").alias("n"),
            F.create_map(F.lit("a"), F.col("id")).alias("m"),
        ).alias("meta"),
        F.array(F.create_map(F.lit("b"), F.col("id"))).alias("tags"),
    )
    small = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit("x").alias("name")
    )
    got = salted_join(big, small, "k", salt=4)
    want = big.join(small, "k")
    assert got.count() == want.count() == 200
    assert sorted(got.columns) == sorted(want.columns)

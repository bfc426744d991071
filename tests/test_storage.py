"""Bucketed/partitioned storage: the shuffle-elimination proof."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, tables):
    from dazzleduck_sql_duckdb_spark.operators.storage import write_bucketed

    write_bucketed(
        spark.table("orders"), "orders_b",
        bucket_cols="o_custkey", n_buckets=8, sort_cols="o_custkey",
    )
    write_bucketed(
        spark.table("customer"), "customer_b",
        bucket_cols="c_custkey", n_buckets=8, sort_cols="c_custkey",
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    # disable auto-broadcast so the join would otherwise shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(bucketed):
    spark = bucketed
    got = (
        spark.table("orders_b")
        .join(spark.table("customer_b"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = (
        spark.table("orders")
        .join(spark.table("customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_bucketed_groupby_has_no_exchange(bucketed):
    spark = bucketed
    agg = spark.table("orders_b").groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("s")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_partitioned_write_prunes(spark, tables, tmp_path):
    from dazzleduck_sql_duckdb_spark.operators.storage import (
        write_partitioned,
    )

    path = str(tmp_path / "orders_part")
    write_partitioned(
        spark.table("orders"), path, partition_cols="o_orderstatus"
    )
    df = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    n_direct = spark.table("orders").where("o_orderstatus = 'F'").count()
    assert df.count() == n_direct

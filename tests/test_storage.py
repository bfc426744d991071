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


def test_zorder_value_locality_and_bounds(spark):
    """Key arithmetic laws: z in [0, 4^bits); the four corners of the
    2-D domain land in the four key quadrants (interleaving, not
    concatenation); NULL quantizes to bucket 0."""
    from pyspark.sql import functions as F

    from dazzleduck_sql_duckdb_spark.operators.storage import zorder_value

    df = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 0.0, 100.0), (2, 100.0, 0.0),
         (3, 100.0, 100.0), (4, None, 100.0)],
        "id INT, a DOUBLE, b DOUBLE",
    )
    z = zorder_value(["a", "b"], [0.0, 0.0], [100.0, 100.0], bits=8)
    got = {r.id: r.z for r in df.select("id", z.alias("z")).collect()}
    hi = 1 << 16
    assert all(0 <= v < hi for v in got.values())
    assert got[0] == 0
    assert got[3] == hi - 1
    # corner (a=0,b=max): only b's (LSB-lane) bits set -> key 0b0101..
    # corner (a=max,b=0): only a's (MSB-lane) bits set -> key 0b1010..
    assert got[1] == sum(1 << (2 * k) for k in range(8))
    assert got[2] == sum(1 << (2 * k + 1) for k in range(8))
    assert got[4] == got[1], "NULL must quantize to bucket 0"


def test_zorder_write_skips_row_groups(spark, tmp_path):
    """The layout's entire point, measured: a 2-D box predicate over
    z-ordered parquet must prune MORE row groups by min/max stats
    than the same rows written in arrival order — and on BOTH
    dimensions, which a single-column sort cannot do."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from dazzleduck_sql_duckdb_spark.operators.storage import (
        write_zordered,
    )

    n = 40_000
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 197).cast("double").alias("x"),
        ((F.col("id") * 7919) % 211).cast("double").alias("y"),
    )
    nat, zord = str(tmp_path / "nat"), str(tmp_path / "zord")
    df.repartition(8).write.parquet(nat)
    write_zordered(
        df, zord, zorder_cols=["x", "y"],
        mins=[0.0, 0.0], maxs=[196.0, 210.0], bits=8, n_files=8,
    )

    def surviving(path, lo_x, hi_x, lo_y, hi_y):
        import glob as g

        total = kept = 0
        for f in g.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {
                md.row_group(0).column(i).path_in_schema: i
                for i in range(md.num_columns)
            }
            for rg in range(md.num_row_groups):
                total += 1
                sx = md.row_group(rg).column(cols["x"]).statistics
                sy = md.row_group(rg).column(cols["y"]).statistics
                if (sx.min <= hi_x and sx.max >= lo_x
                        and sy.min <= hi_y and sy.max >= lo_y):
                    kept += 1
        return kept, total

    kn, tn = surviving(nat, 10, 30, 10, 30)
    kz, tz = surviving(zord, 10, 30, 10, 30)
    assert kn == tn, "arrival order should prune ~nothing on this box"
    assert kz < tz, "z-order pruned no row groups"
    assert kz / tz <= 0.5, f"z-order skip rate too weak: {kz}/{tz}"
    # and correctness: both layouts return identical matching rows
    got_n = spark.read.parquet(nat).where(
        "x between 10 and 30 and y between 10 and 30"
    ).count()
    got_z = spark.read.parquet(zord).where(
        "x between 10 and 30 and y between 10 and 30"
    ).count()
    assert got_n == got_z > 0


def test_compact_parquet_shrinks_files_preserves_rows(spark, tmp_path):
    """64 micro-batch-sized files -> a handful; rows identical; sorted
    compaction re-establishes min/max locality on the sort column."""
    from pyspark.sql import functions as F

    from dazzleduck_sql_duckdb_spark.operators.storage import (
        compact_parquet,
    )

    src, dst, dsts = (
        str(tmp_path / "src"), str(tmp_path / "dst"),
        str(tmp_path / "dsts"),
    )
    df = spark.range(20_000).select(
        "id", (F.col("id") % 937).alias("k")
    )
    df.repartition(64).write.parquet(src)
    stats = compact_parquet(spark, src, dst, target_mb=1)
    assert stats["files_before"] == 64
    assert stats["files_after"] < 64
    assert spark.read.parquet(dst).count() == 20_000
    assert sorted(
        r.id for r in spark.read.parquet(dst).collect()
    ) == list(range(20_000))
    # sorted compaction: every output file covers a disjoint id range
    stats2 = compact_parquet(
        spark, src, dsts, target_mb=1, sort_cols=["id"]
    )
    assert stats2["files_after"] >= 1
    import glob as g

    import pyarrow.parquet as pq

    ranges = []
    for f in g.glob(dsts + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.num_columns)
        }
        lo = min(
            md.row_group(r).column(cols["id"]).statistics.min
            for r in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(r).column(cols["id"]).statistics.max
            for r in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    ranges.sort()
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 < l2, "sorted compaction produced overlapping files"

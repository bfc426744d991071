"""Storage-layout operators: bucketed tables for shuffle-free joins.

The reference is read-only (SURVEY.md §2.1 S5: no sink), so this module
is engine-added capability: the write path a 100 TB deployment needs so
that repeated joins/aggregations on the same key do NOT re-shuffle the
fact table every query.

- ``write_bucketed``: persist a DataFrame hash-bucketed (and optionally
  sorted) by the join/aggregation key. Spark records the bucketing in
  the catalog; subsequent equi-joins or groupBys on that key read
  co-located buckets and skip the Exchange entirely (asserted in
  tests/test_storage.py from the physical plan).
- ``write_partitioned``: directory-partitioned parquet for coarse
  pruning columns (date, tenant) — partition pruning happens at file
  listing, before any I/O.

Rule of thumb at scale: partition by the column you FILTER on
(low-cardinality, coarse), bucket by the column you JOIN on
(high-cardinality key), and pick bucket counts that keep each bucket
in the 100-500 MB range at the target data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Save as a bucketed (+sorted) table. `path` makes it external
    (explicit location, independent of the session's warehouse dir)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).bucketBy(n_buckets, cols[0], *cols[1:])
    if sort_cols:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(s[0], *s[1:])
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_cols: list[str] | str,
    mode: str = "overwrite",
) -> None:
    """Save as directory-partitioned parquet (partition-pruned scans)."""
    cols = (
        [partition_cols]
        if isinstance(partition_cols, str)
        else list(partition_cols)
    )
    df.write.mode(mode).partitionBy(*cols).parquet(path)

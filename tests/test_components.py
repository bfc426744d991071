"""Connected-components unit tests on known graphs."""

from __future__ import annotations

from dazzleduck_sql_duckdb_spark.operators.components import (
    connected_components,
)


def _run(spark, edges):
    df = spark.createDataFrame(edges, schema="src LONG, dst LONG")
    rows = connected_components(df).collect()
    return {r.doc_id: r.component for r in rows}


def test_two_components(spark):
    got = _run(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_needs_propagation(spark):
    """A path graph exercises multi-round convergence (diameter 5)."""
    got = _run(spark, [(5, 4), (4, 3), (3, 2), (2, 1), (1, 0)])
    assert got == {i: 0 for i in range(6)}


def test_cycle_and_self_loop(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 1), (7, 7)])
    assert got == {1: 1, 2: 1, 3: 1, 7: 7}

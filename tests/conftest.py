"""Shared fixtures: one SparkSession per test session, testdata views."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dazzleduck_sql_duckdb_spark.session import get_spark

    # The suite runs at sf0.001 (500-row corpora): per-action cost is
    # pure scheduling floor, and the floor grows with local threads —
    # the r13 driver's own 8-vs-32-core block measured 50/53 bench
    # queries FASTER at 8 cores, and the full suite measured 25%
    # faster at local[8] than local[32] on identical code (r14 suite
    # timing, OPTIMIZATION_r14.md). The driver's verify budget
    # truncated the r13 suite run, so suite wall time is itself a
    # gate-health property. SPARK_GRAFT_TEST_CPUS overrides; the bench
    # (bench.py) is unaffected — it builds its own session from
    # SPARK_GRAFT_CPUS as the driver contract requires.
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    s = get_spark(
        app_name="dazzleduck_tests",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus != "*" else None,
    )
    yield s


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Session alias usable inside hypothesis @given tests (function-scoped
    fixtures are disallowed there; the Spark session is session-scoped)."""
    return spark


@pytest.fixture(scope="session")
def tables(spark):
    """Testdata views registered + dd_* functions available."""
    from dazzleduck_sql_duckdb_spark import functions as ddfn
    from dazzleduck_sql_duckdb_spark.session import load_tables

    out = load_tables(spark, SF_DIR)
    ddfn.register_all(spark)
    return out

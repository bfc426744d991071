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

    s = get_spark(app_name="dazzleduck_tests")
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

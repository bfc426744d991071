"""Full-catalog differential gate at sf0.001 — the local replica of the
driver's correctness check (SURVEY.md §5: DuckDB-as-oracle pattern)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from check_parity import run_parity  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_catalog_matches_duckdb_oracle(spark):
    n_pass, n_fail, failures = run_parity(spark, SF_DIR, verbose=False)
    assert n_fail == 0, f"parity failures: {failures}"
    assert n_pass >= 35


def test_every_query_has_oracle_or_documented_skip(spark):
    import __spark_entry__ as E
    from dazzleduck_sql_duckdb_spark.plans import queries as Q

    qs = E.queries()
    osql = E.oracle_sql()
    missing = set(qs) - set(osql) - Q.ORACLE_SKIP
    assert not missing, f"queries without oracle: {missing}"


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns

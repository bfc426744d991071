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


def test_prepare_pins_utc_session_timezone(spark):
    """The driver's session is vanilla and every NTZ->TIMESTAMP cast is
    session-timezone-dependent; _prepare must pin UTC or a non-UTC
    driver JVM shifts every event/date epoch vs the DuckDB oracle."""
    import __spark_entry__ as E

    E.queries()["lineitem_count"](spark, SF_DIR)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_gate_window_covers_every_family():
    """The driver gates the FIRST 50 catalog entries. Pin that the window
    is exactly 50, leads the catalog, and contains at least one entry
    per operator family (an entry silently falling past the window means
    that family gets no hard-signal verdict this round)."""
    from dazzleduck_sql_duckdb_spark.plans import queries as Q

    window = Q._GATE_WINDOW
    assert len(window) == 50
    assert len(set(window)) == 50
    assert list(Q.CATALOG)[:50] == window
    families = {
        "bloom": ["bloom_no_false_negatives"],
        "dd_functions": ["dd_search_marker"],
        "dedup": ["dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
                  "dedup_components"],
        "embedding": ["embed_knn_bruteforce", "embed_ann_ivf_fullprobe",
                      "embed_neardup_lsh"],
        "text": ["text_langid", "text_quality", "text_tfidf_topk",
                 "cross_source_contamination", "text_redact_pii"],
        "remote": ["remote_scan_split_agg", "remote_scan_filter_pushdown",
                   "remote_login_scan"],
        "storage_join_skew": ["bucketed_join_rollup",
                              "events_orders_asof_join",
                              "events_activity_range_join",
                              "skew_salted_join_agg"],
        "multimodal": ["multimodal_media_keys"],
        "relational": ["q1_pricing_summary", "q6_revenue",
                       "orders_rollup", "string_functions"],
    }
    in_window = set(window)
    for family, names in families.items():
        assert in_window & set(names), f"family {family} not in gate window"

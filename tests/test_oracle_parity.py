"""Full-catalog differential gate at sf0.001 — the local replica of the
driver's correctness check (SURVEY.md §5: DuckDB-as-oracle pattern)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import pytest  # noqa: E402

from check_parity import run_parity  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.mark.parity
def test_catalog_matches_duckdb_oracle(spark):
    """The full-catalog gate (~6 min of the suite). Per-commit fast
    path when iterating on specific entries:

        SPARK_GRAFT_PARITY_ONLY=text_tfidf_topk,q1_pricing_summary \
            python -m pytest -m parity -q

    (equivalently: python tools/check_parity.py <sf_dir> name ...)"""
    only = {
        n for n in os.environ.get(
            "SPARK_GRAFT_PARITY_ONLY", ""
        ).split(",") if n
    }
    n_pass, n_fail, failures = run_parity(
        spark, SF_DIR, only=only or None, verbose=False
    )
    assert n_fail == 0, f"parity failures: {failures}"
    assert n_pass >= (len(only) // 2 if only else 35)


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
    """The driver gates the FIRST 50 catalog entries. Round-4 window
    contract: every entry CHANGED this round, plus every entry whose
    latest driver verdict is r2 (the 41 entries outside the r3 window),
    must be inside the window; everything excluded carries an r3-green
    verdict. An entry silently falling out of both sets would keep a
    stale hard verdict."""
    from dazzleduck_sql_duckdb_spark.plans import queries as Q

    window = Q._GATE_WINDOW
    assert len(window) == 50
    assert len(set(window)) == 50
    assert list(Q.CATALOG)[:50] == window
    changed_this_round = {
        "remote_agg_pushdown",      # split path -> single scan relation
        "remote_splits_plan",       # newly hash-gated
        "multimodal_features",      # newly hash-gated
        "multimodal_png_features",  # new entry
        "skew_salted_join_agg",     # deterministic row salt
    }
    # the 41 entries whose latest verdict predates round 3 (everything
    # the r3 window did not re-gate), minus the three already counted
    # as changed this round
    r2_latest = {
        "q6_revenue", "orders_global_aggs", "orders_group_agg",
        "join_region_rollup", "events_hourly_rollup", "orders_rollup",
        "supplier_nation_join", "customer_orders_left_join",
        "orders_running_totals", "q3_shipping_priority",
        "q5_regional_volume", "q10_returned_items", "q14_promo_effect",
        "q18_large_volume", "q19_disjunctive_join", "dd_search_marker",
        "bloom_no_false_negatives", "dedup_exact", "dedup_simhash",
        "ngram_jaccard_sampled", "embed_knn_bruteforce",
        "embed_cosine_neardup", "text_langid", "text_quality",
        "text_fingerprint", "docs_length_quantiles",
        "pipeline_clean_corpus", "docs_shard_assignment",
        "cross_source_contamination", "corpus_top_terms",
        "text_tfidf_topk", "remote_scan_filter_pushdown",
        "remote_login_scan", "embed_neardup_lsh",
        "docs_stratified_sample", "pack_sequences", "text_redact_pii",
        "events_activity_range_join", "multimodal_media_keys",
    }
    in_window = set(window)
    for group_name, names in [
        ("changed_this_round", changed_this_round),
        ("r2_latest", r2_latest),
    ]:
        missing = names - in_window
        assert not missing, f"{group_name} entries outside window: {missing}"
    # the remaining slots re-verify the r4-touched mechanisms: the
    # split-scan partitions() path the agg mode now rides, projection
    # pushdown, the decimal flagship, and the heaviest dedup pipelines
    canaries = in_window - changed_this_round - r2_latest
    assert canaries == {
        "remote_scan_split_agg", "lineitem_projection",
        "q1_pricing_summary", "dedup_minhash_lsh", "dedup_components",
        "dedup_canonical_corpus",
    }

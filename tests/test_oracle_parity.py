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
    """The driver gates the FIRST 50 catalog entries. Round-3 window
    contract: every entry the driver has never seen post-r2 (never
    gated, gated only pre-micros-migration, or added/changed this
    round) must be inside the window; an entry silently falling past it
    keeps a stale — or nonexistent — hard verdict."""
    from dazzleduck_sql_duckdb_spark.plans import queries as Q

    window = Q._GATE_WINDOW
    assert len(window) == 50
    assert len(set(window)) == 50
    assert list(Q.CATALOG)[:50] == window
    never_gated = {
        "dd_version", "dedup_canonical_corpus", "simhash_values",
        "text_token_stats", "remote_splits_plan", "multimodal_features",
    }
    changed_this_round = {
        "embed_ann_recall", "embed_ann_ivf_probed",
        "embed_ann_ivf_fullprobe", "string_functions",
        "text_repetition",
    }
    stale_events_r1 = {
        "events_count_distinct", "events_json_extract",
        "events_sessionize", "events_sessionize_native",
        "events_type_pivot", "events_funnel",
        "events_view_click_attribution", "events_grouping_sets",
    }
    r1_only_rest = {
        "lineitem_count", "lineitem_sum_orderkey", "lineitem_full_scan",
        "lineitem_point_filter", "lineitem_projection",
        "lineitem_range_filter", "lineitem_date_filter_count",
        "null_laws", "empty_set_laws", "order_by_limit", "distinct_rows",
        "cte_union_all", "scalar_subquery_filter", "semi_anti_join",
        "window_topk_per_group", "orders_set_ops", "orders_cube",
        "cast_matrix", "try_cast_matrix", "remote_agg_pushdown",
        "part_brand_stats", "nation_presence_full_join",
        "q4_order_priority", "dd_array_contains_all",
        "dd_array_contains_all_fn",
    }
    in_window = set(window)
    for group_name, names in [
        ("never_gated", never_gated),
        ("changed_this_round", changed_this_round),
        ("stale_events_r1", stale_events_r1),
        ("r1_only_rest", r1_only_rest),
    ]:
        missing = names - in_window
        assert not missing, f"{group_name} entries outside window: {missing}"
    # the remaining slots are r2-green family canaries
    canaries = in_window - never_gated - changed_this_round \
        - stale_events_r1 - r1_only_rest
    # bloom_no_false_negatives was displaced by text_repetition's
    # rewrite: r2-green, unchanged since, and locally pinned by the
    # hypothesis never-false-negative law
    assert canaries == {
        "q1_pricing_summary", "dedup_minhash_lsh", "dedup_components",
        "remote_scan_split_agg",
        "bucketed_join_rollup", "events_orders_asof_join",
    }

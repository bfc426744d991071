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
    """Round-6 window contract (the driver gates the FIRST 50 catalog
    entries): every entry CHANGED/NEW this round, the r3-stale IVF
    trio, and ALL remaining r3-vintage entries must be inside; every
    entry excluded carries an r5-green verdict over an implementation
    untouched since round 5."""
    from dazzleduck_sql_duckdb_spark.plans import queries as Q

    window = Q._GATE_WINDOW
    assert len(window) == 50
    assert len(set(window)) == 50
    assert list(Q.CATALOG)[:50] == window
    changed_or_new = {
        "text_tfidf_topk",            # single-statement repartition form
        "q18_large_volume",           # long-domain HAVING sum
        "dedup_minhash_lsh",          # verify-path restructure
        "dedup_components",           # consumes the minhash pairs
        "dedup_canonical_corpus",     # consumes the minhash pairs
        "dedup_minhash_auto",         # NEW: production knobs
        "dedup_minhash_recall_held",  # NEW: K grows with r
        "multimodal_video_metadata",  # NEW: MP4 box walk
        "multimodal_jpeg_features",   # never driver-gated + r6 change
        "embed_ann_ivfpq",            # NEW: compressed ANN scale path
        "embed_ann_ivfpq_recall",     # NEW: its recall-floor gate
    }
    ivf_stale = {
        "embed_ann_ivf_fullprobe", "embed_ann_ivf_probed",
        "embed_ann_recall",
    }
    # dd_version and lineitem_count are rotated OUT (round-6 decision,
    # documented at _GATE_WINDOW): a constant literal SELECT and a bare
    # count(*), both r3-green over implementations untouched since
    # rounds 1-2 — the two lowest-staleness-risk entries — displaced
    # by the new IVF-PQ pair.
    r3_vintage_rest = {
        "bucketed_join_rollup", "cast_matrix", "cte_union_all",
        "dd_array_contains_all", "dd_array_contains_all_fn",
        "distinct_rows", "empty_set_laws",
        "events_count_distinct", "events_funnel",
        "events_grouping_sets", "events_json_extract",
        "events_orders_asof_join", "events_sessionize",
        "events_sessionize_native", "events_type_pivot",
        "events_view_click_attribution",
        "lineitem_date_filter_count", "lineitem_full_scan",
        "lineitem_point_filter", "lineitem_range_filter",
        "lineitem_sum_orderkey", "nation_presence_full_join",
        "null_laws", "order_by_limit", "orders_cube", "orders_set_ops",
        "part_brand_stats", "q4_order_priority",
        "scalar_subquery_filter", "semi_anti_join", "simhash_values",
        "string_functions", "text_repetition", "text_token_stats",
        "try_cast_matrix", "window_topk_per_group",
    }
    in_window = set(window)
    for group, names in [
        ("changed_or_new", changed_or_new),
        ("ivf_stale", ivf_stale),
        ("r3_vintage_rest", r3_vintage_rest),
    ]:
        missing = names - in_window
        assert not missing, f"{group} entries outside window: {missing}"
    # exhaustive: the three sets ARE the window, no free-floating slots
    assert in_window == changed_or_new | ivf_stale | r3_vintage_rest


def test_gate_window_round_ratchet():
    """The staleness ratchet the r5 verdict demanded: the window must
    be re-derived every round. _GATE_WINDOW_ROUND must equal (max
    round among committed CORRECTNESS_r files) + 1 — the moment the
    driver lands this round's CORRECTNESS file, the suite fails until
    the NEXT round consciously re-derives the window (and, per the
    policy above, puts every entry it changed inside it)."""
    import glob
    import re

    from dazzleduck_sql_duckdb_spark.plans import queries as Q

    rounds = [
        int(re.search(r"CORRECTNESS_r(\d+)", f).group(1))
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    assert rounds, "driver correctness files missing"
    assert Q._GATE_WINDOW_ROUND == max(rounds) + 1, (
        f"gate window derived for round {Q._GATE_WINDOW_ROUND} but the"
        f" latest driver verdict is round {max(rounds)} — re-derive"
        " _GATE_WINDOW for the new round (plans/queries.py gate order)"
    )

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
    """Round-9 window contract (the driver gates the FIRST 50 catalog
    entries): every entry round 9 changes/adds and the r6-vintage
    cohort (the oldest rows in GATE_AGE.md after the r8 rotation),
    minus the session-2 displacements documented below; every entry
    excluded carries an r7/r8-green verdict over an implementation
    untouched since its verdict (ages in GATE_AGE.md)."""
    from dazzleduck_sql_duckdb_spark.plans import queries as Q

    window = Q._GATE_WINDOW
    assert len(window) == 50
    assert len(set(window)) == 50
    assert list(Q.CATALOG)[:50] == window
    changed_or_new = {
        "dedup_exact_substring",       # perf rewrite (r8 directive #2)
        "embed_semantic_dedup",        # advisor: anchor/spill fixes
        "embed_semantic_dedup_exact",  # advisor: n_clusters=1 anchor
        "embed_semantic_dedup_recall",  # advisor: pre-spill oversize
        "dedup_stream_screen",         # advisor: capped-band recall
        "text_perplexity_static_lm",   # vocab cap + probe-first guard
        "embed_knn_bruteforce",        # _collect_query_matrix guard
        "embed_ann_ivfpq",             # _collect_query_matrix guard
        "embed_ann_ivfpq_fullprobe",   # _collect_query_matrix guard
        "embed_ann_ivfpq_recall",      # _collect_query_matrix guard
        "remote_scan_dsv2",            # canonical shim gate (dir. #6)
        "remote_scan_dsv2_split_dec",  # NEW: split decimal partials
        "multimodal_video_frames",     # jpeg.py LUT entropy decoder
        "layout_zorder",               # NEW: Morton layout key
        "dedup_substring_screen",      # NEW: passage-dedup screen
        "embed_semantic_screen",       # NEW: semantic screen anchor
        "text_perplexity_bigram",      # NEW: bigram-LM train/score
        "q21_suppliers_waiting",       # NEW (session 2): TPC-H q21
        "sketch_distinct_bounds",      # NEW (session 2): HLL contract
        "sketch_quantile_bounds",      # NEW (session 2): GK/t-digest
    }
    r6_cohort = {
        "bucketed_join_rollup", "cast_matrix", "cte_union_all",
        "distinct_rows", "embed_ann_ivf_fullprobe",
        "embed_ann_ivf_probed", "embed_ann_recall", "empty_set_laws",
        "events_count_distinct", "events_funnel",
        "events_grouping_sets", "events_json_extract",
        "events_sessionize", "events_sessionize_native",
        "events_view_click_attribution",
        "lineitem_date_filter_count", "lineitem_full_scan",
        "lineitem_point_filter", "lineitem_sum_orderkey",
        "multimodal_jpeg_features", "nation_presence_full_join",
        "order_by_limit", "orders_cube", "part_brand_stats",
        "q18_large_volume", "q4_order_priority",
        "scalar_subquery_filter", "semi_anti_join", "simhash_values",
        "window_topk_per_group",
    }
    # session-2 amendment: the three late additions displaced both
    # r7-vintage fills (dd_version, dedup_components — each r7-green
    # over untouched code, components pinned by its own randomized
    # differential) and one r6-cohort entry with an in-window kin
    # (events_type_pivot — pivot pinned by pytest, orders_cube
    # in-window; the identical displacement r8 used). It MUST rotate
    # into the r10 window (staleness bound hits age 4 at r10+1).
    in_window = set(window)
    for group, names in [
        ("changed_or_new", changed_or_new),
        ("r6_cohort", r6_cohort),
    ]:
        missing = names - in_window
        assert not missing, f"{group} entries outside window: {missing}"
    # exhaustive: the two sets ARE the window, no free-floating slots
    assert in_window == changed_or_new | r6_cohort


def test_gate_age_report_current():
    """GATE_AGE.md must be regenerated whenever a CORRECTNESS file
    lands (r7 verdict directive #7): per-entry verdict age is the
    input to window derivation, so a stale report makes the rotation
    policy unauditable."""
    import gate_age

    ages, latest = gate_age.last_green_rounds()
    text = gate_age.render(ages, latest)
    with open(os.path.join(REPO, "GATE_AGE.md")) as f:
        assert f.read() == text, (
            "GATE_AGE.md stale — rerun: python tools/gate_age.py"
        )


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


def test_gate_age_staleness_bound():
    """The inverse of the rotation policy (r8 verdict directive #7):
    once an entry has EVER been driver-green, its last-green round may
    trail the latest driver round by at most 3 — the window rotation
    must keep the tail fresh, and this assert turns silent decay into
    a suite failure. (Never-gated entries are the documented
    ORACLE_SKIP/no-oracle set, covered by their twin entries.)"""
    import gate_age

    ages, latest = gate_age.last_green_rounds()
    assert ages and latest >= 8
    stale = {n: r for n, r in ages.items() if latest - r > 3}
    assert not stale, (
        f"entries last green more than 3 rounds ago (latest r{latest}):"
        f" {stale} — rotate them into _GATE_WINDOW"
    )

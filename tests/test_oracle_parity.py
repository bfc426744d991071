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
    """Round-7 window contract (the driver gates the FIRST 50 catalog
    entries): every entry round 7 changes/adds, the r3-vintage pair
    rotated back in, and an oldest-first r5 fill; every entry excluded
    carries an r5/r6-green verdict over an implementation untouched
    since its verdict (freshness table in the _GATE_WINDOW comment)."""
    from dazzleduck_sql_duckdb_spark.plans import queries as Q

    window = Q._GATE_WINDOW
    assert len(window) == 50
    assert len(set(window)) == 50
    assert list(Q.CATALOG)[:50] == window
    changed_or_new = {
        "remote_scan_dsv2",           # NEW: shim under the hash gate
        "dedup_minhash_lsh",          # size-aware eager staging
        "dedup_components",           # consumes the minhash pairs
        "dedup_canonical_corpus",     # consumes the minhash pairs
        "dedup_minhash_auto",         # consumes the minhash pairs
        "dedup_minhash_recall_held",  # consumes the minhash pairs
        "embed_ann_ivfpq",            # generic-id rerank fix
        "embed_ann_ivfpq_recall",     # generic-id rerank fix
        "embed_ann_ivfpq_fullprobe",  # NEW: PQ exactness anchor
        "multimodal_video_frames",    # NEW: MJPEG frame decode
        "text_perplexity",            # NEW: unigram-LM quality score
        "dedup_exact_substring",      # NEW: shared-window passage dedup
        "q7_volume_shipping",         # NEW: TPC-H Q7 (dual nation roles)
        "q8_market_share",            # NEW: TPC-H Q8 (8-table share)
        "cross_source_contamination", # exchange-free sid assignment
    }
    r3_rotated_in = {"lineitem_count", "dd_version"}
    r5_fill = {
        "bloom_no_false_negatives", "corpus_top_terms", "dedup_exact",
        "dedup_simhash", "docs_length_quantiles",
        "docs_shard_assignment", "docs_stratified_sample",
        "embed_cosine_neardup", "embed_knn_bruteforce",
        "embed_neardup_lsh", "events_activity_range_join",
        "multimodal_features",
        "multimodal_media_keys", "multimodal_png_features",
        "ngram_jaccard_sampled",
        "orders_running_totals", "pack_sequences",
        "pipeline_clean_corpus", "q10_returned_items",
        "q19_disjunctive_join",
        "q1_pricing_summary", "q3_shipping_priority",
        "q5_regional_volume", "remote_agg_pushdown",
        "remote_login_scan", "remote_scan_filter_pushdown",
        "remote_scan_split_agg", "remote_splits_plan",
        "skew_salted_join_agg",
        "text_fingerprint", "text_langid", "text_quality",
        "text_redact_pii",
    }
    in_window = set(window)
    for group, names in [
        ("changed_or_new", changed_or_new),
        ("r3_rotated_in", r3_rotated_in),
        ("r5_fill", r5_fill),
    ]:
        missing = names - in_window
        assert not missing, f"{group} entries outside window: {missing}"
    # exhaustive: the three sets ARE the window, no free-floating slots
    assert in_window == changed_or_new | r3_rotated_in | r5_fill


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

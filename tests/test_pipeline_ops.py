"""Invariant tests for the training-pipeline catalog operators.

The oracle hash gate (test_oracle_parity.py) pins exact values; these
pin the LAWS each operator must satisfy on any input — the properties a
user of the pipeline relies on (sharding is a partition, ratios are
ratios, quantiles are ordered) stated independently of the data.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def run(spark, tables):
    import __spark_entry__ as E

    qs = E.queries()

    def _run(name: str):
        return qs[name](spark, SF_DIR)

    return _run


def test_shard_assignment_is_a_partition(run, spark):
    """Every document lands in exactly one shard; shards are in [0,16);
    in-shard positions are exactly 1..shard_size (dense, no gaps)."""
    df = run("docs_shard_assignment").cache()
    n_docs = spark.table("documents").count()
    assert df.count() == n_docs
    assert df.select("doc_id").distinct().count() == n_docs
    rows = df.groupBy("shard").agg(
        {"pos": "max", "*": "count"}
    ).collect()
    for r in rows:
        assert 0 <= r["shard"] < 16
        assert r["max(pos)"] == r["count(1)"]  # dense 1..n
    df.unpersist()


def test_shard_assignment_deterministic_across_runs(run):
    a = sorted(map(tuple, run("docs_shard_assignment").collect()))
    b = sorted(map(tuple, run("docs_shard_assignment").collect()))
    assert a == b


def test_repetition_fracs_are_ratios(run):
    for r in run("text_repetition").collect():
        assert r["n_tok"] >= 2
        assert 0.0 <= r["dup_word_frac"] < 1.0
        assert 0.0 < r["top_bigram_frac"] <= 1.0


def test_contamination_pairs_canonical_and_positive(run):
    for r in run("cross_source_contamination").collect():
        assert r["source_a"] < r["source_b"]
        assert r["shared_ngrams"] > 0


def test_tfidf_topk_bounded_per_doc(run):
    df = run("text_tfidf_topk")
    per_doc = df.groupBy("doc_id").count().collect()
    assert per_doc and all(r["count"] <= 5 for r in per_doc)
    for r in df.limit(200).collect():
        assert r["tf"] >= 1 and r["df"] >= 1


def test_length_quantiles_ordered(run):
    for r in run("docs_length_quantiles").collect():
        assert (
            r["min_chars"] <= r["p25"] <= r["p50"] <= r["p75"]
            <= r["max_chars"]
        )
        assert r["min_chars"] <= r["avg_chars"] <= r["max_chars"]


def test_approx_count_distinct_tracks_exact(spark, tables):
    """The documented 100 TB substitute for exact count(DISTINCT)
    (OPERATORS.md A6): HLL++ must land within 5% of exact on the events
    stream — the mergeable sketch is the split-safe form the reference
    cannot push (IsSplitSafe excludes DISTINCT)."""
    exact = spark.sql(
        "SELECT count(DISTINCT user_id) AS n FROM events"
    ).collect()[0]["n"]
    approx = spark.sql(
        "SELECT approx_count_distinct(user_id, 0.02) AS n FROM events"
    ).collect()[0]["n"]
    assert abs(approx - exact) <= max(1, 0.05 * exact)


def test_approx_percentile_tracks_exact_quantiles(spark, tables):
    """The documented scale substitute for exact per-source quantiles
    (docs_length_quantiles): approx_percentile within 10% relative."""
    rows = spark.sql("""
        SELECT source,
          percentile(n_chars, 0.5) AS exact_p50,
          approx_percentile(n_chars, 0.5, 1000) AS approx_p50
        FROM documents GROUP BY source
    """).collect()
    assert rows
    for r in rows:
        assert abs(r["approx_p50"] - r["exact_p50"]) <= 0.1 * r["exact_p50"]


def test_funnel_stages_monotone(run):
    """Each funnel stage requires the previous one, so user counts can
    only shrink stage to stage."""
    counts = {r["stage"]: r["n_users"] for r in run("events_funnel").collect()}
    assert set(counts) == {"stage1_view", "stage2_click", "stage3_purchase"}
    assert counts["stage1_view"] >= counts["stage2_click"] >= counts["stage3_purchase"]
    assert counts["stage1_view"] > 0


def test_top_terms_sorted_and_bounded(run):
    rows = run("corpus_top_terms").collect()
    assert 0 < len(rows) <= 50
    counts = [r["term_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)

"""Physical-plan invariants: the scale contract, asserted.

Correctness says what a query returns; these tests pin HOW it executes —
the properties that decide whether the same plan survives a 100 TB /
1000-executor scale-up: filters and projections reaching the parquet
scan, small dimensions broadcast (fact table never sort-merge-shuffled),
top-k never materializing a full sort, aggregates combining map-side,
and no Python evaluation inside pure-relational paths.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def plans(spark, tables):
    import __spark_entry__ as E

    qs = E.queries()

    def plan(name: str) -> str:
        df = qs[name](spark, SF_DIR)
        return df._jdf.queryExecution().executedPlan().toString()

    return plan


def test_projection_pushdown_prunes_scan(plans):
    p = plans("lineitem_projection")
    assert "ReadSchema: struct<l_orderkey:bigint>" in p


def test_filter_pushdown_reaches_parquet(plans):
    p = plans("lineitem_range_filter")
    pushed = p.split("PushedFilters:")[1][:200]
    assert "l_extendedprice" in pushed
    # scan reads only the 3 projected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double" in p


def test_q6_scan_shape(plans):
    p = plans("q6_revenue")
    pushed = p.split("PushedFilters:")[1][:300]
    assert "l_shipdate" in pushed and "l_discount" in pushed
    assert "EvalPython" not in p          # pure JVM path
    assert "partial_sum" in p             # map-side combine before exchange


def test_star_join_broadcasts_dimensions(plans):
    p = plans("join_region_rollup")
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_topk_avoids_global_sort(plans):
    p = plans("order_by_limit")
    assert "TakeOrderedAndProject" in p


def test_group_agg_partial_before_shuffle(plans):
    p = plans("orders_group_agg")
    assert "partial_" in p


def test_relational_catalog_is_python_free(plans):
    """Every pure-relational catalog query must stay JVM-side; Python is
    allowed only in the operators that are *defined* by Python kernels
    (minhash signatures, IVF, bloom/media UDFs)."""
    relational = [
        "lineitem_count", "lineitem_full_scan", "q1_pricing_summary",
        "orders_global_aggs", "events_count_distinct", "cte_union_all",
        "scalar_subquery_filter", "semi_anti_join", "window_topk_per_group",
        "events_hourly_rollup", "events_json_extract", "events_sessionize",
        "dedup_exact", "text_langid", "text_quality", "text_token_stats",
        "text_fingerprint", "dd_array_contains_all",
    ]
    for name in relational:
        assert "EvalPython" not in plans(name), f"{name} fell off JVM"


def test_tpch_joins_never_nested_loop_on_fact(plans):
    """Every TPC-H multi-join must resolve to hash joins: Q19's
    disjunctive predicate still has an extractable equi-key (p_partkey),
    so a CartesianProduct/NLJ anywhere means the planner lost the key —
    at 100 TB that is |lineitem|x|part|."""
    for name in [
        "q3_shipping_priority", "q4_order_priority", "q5_regional_volume",
        "q10_returned_items", "q14_promo_effect", "q18_large_volume",
        "q19_disjunctive_join", "q9_product_profit",
        "q12_priority_shipping", "q13_customer_distribution",
        "q15_top_supplier", "q16_supplier_cnt", "q17_small_quantity",
    ]:
        p = plans(name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
        assert "partial_" in p, name          # map-side combine everywhere
        assert "EvalPython" not in p, name


def test_tpch_exists_decorrelated_to_semi_join(plans):
    """Q4's correlated EXISTS must decorrelate to a semi join (one pass
    over lineitem), never a per-order subquery re-execution."""
    assert "LeftSemi" in plans("q4_order_priority")


def test_q18_subquery_aggregated_once(plans):
    """The IN-subquery form makes Spark infer the semi join onto both
    orders AND lineitem — the heavy per-orderkey aggregation runs twice.
    The catalog computes the per-orderkey sum ONCE (the HAVING predicate
    and the output column are the same aggregate): exactly 1 lineitem
    scan."""
    p = plans("q18_large_volume")
    scans = [ln for ln in p.splitlines()
             if "FileScan parquet" in ln and "l_quantity" in ln]
    assert len(scans) == 1, p


def test_top_terms_heap_topk_with_partial_counts(plans):
    """Heavy-hitters: exchange carries per-partition partial counts (one
    row per term per map task, not one per token) and the top-50 is a
    per-partition heap merge, not a global sort."""
    p = plans("corpus_top_terms")
    assert "partial_count" in p
    assert "TakeOrderedAndProject" in p
    assert "EvalPython" not in p


def test_repetition_and_quantiles_stay_jvm(plans):
    for name in ["text_repetition", "docs_length_quantiles",
                 "docs_shard_assignment", "cross_source_contamination"]:
        p = plans(name)
        assert "EvalPython" not in p, name


def test_explodes_generate_raw_arrays_not_transforms(plans):
    """Generate re-evaluates a computed generator expression per OUTPUT
    row (measured 15x at sf0.1): every exploding query must posexplode/
    explode a raw or exchange-materialized array, never transform(...)
    inline. Detect by asserting no lambda marker inside Generate."""
    for name in ["cross_source_contamination",
                 "corpus_top_terms", "text_tfidf_topk"]:
        p = plans(name)
        gen_lines = [ln for ln in p.splitlines() if "Generate " in ln]
        assert gen_lines, name
        assert all("lambdafunction" not in ln for ln in gen_lines), name


def test_repetition_is_per_row_zero_shuffle(plans):
    """text_repetition's outputs are functions of one document's token
    array, so its plan must stay fully per-row: no Generate (explode)
    and no key-partitioned exchange — at 100 TB the old explode +
    GROUP BY (doc_id, bigram) form shuffled the whole corpus twice.
    The only allowed exchange is the narrow-input REPARTITION hint
    (round-robin, a no-op on real multi-partition inputs)."""
    p = plans("text_repetition")
    assert "Generate " not in p
    assert "hashpartitioning" not in p


def test_shard_assignment_never_reads_text(plans):
    """The shard map needs only doc_id; if the scan schema ever picks up
    `text`, a 100 TB shard-assignment job reads the whole corpus."""
    p = plans("docs_shard_assignment")
    assert "ReadSchema: struct<doc_id:bigint>" in p


def test_new_relational_entries_stay_jvm(plans):
    for name in ["events_funnel", "orders_running_totals",
                 "customer_orders_left_join", "nation_presence_full_join",
                 "events_type_pivot", "orders_set_ops",
                 "pipeline_clean_corpus", "events_view_click_attribution"]:
        p = plans(name)
        assert "EvalPython" not in p, name
        assert "CartesianProduct" not in p, name


def test_attribution_joins_on_time_bin(plans):
    """events_view_click_attribution routes through range_join_binned:
    the join key must be (user_id, __bin) — the bin bounds candidate
    pairs per key, so a hot user never produces |views|x|clicks| pairs.
    A plain user_id-only equi-join (or any nested loop) is the
    quadratic shape this operator exists to avoid."""
    p = plans("events_view_click_attribution")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    join_lines = [ln for ln in p.splitlines()
                  if "HashJoin" in ln or "SortMergeJoin" in ln]
    assert join_lines, p
    assert any("__bin" in ln for ln in join_lines), join_lines


def test_tfidf_stays_jvm_hash_joined(plans):
    p = plans("text_tfidf_topk")
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p   # the 1-row count side broadcasts
    assert "partial_count" in p


def test_tfidf_window_is_exchange_free_heap(plans):
    """The per-doc top-5 must be a partition-local WindowGroupLimit
    with NO exchange between the scoring join and the Window: the
    REPARTITION(doc_id)-before-explode stage makes hash(doc_id)
    satisfy both the tf aggregation and the window clustering, so the
    only exchanges in the whole plan are the one-row-per-doc
    repartition and the vocabulary-sized df partials."""
    p = plans("text_tfidf_topk")
    assert "WindowGroupLimit" in p
    lines = p.splitlines()
    win = next(i for i, ln in enumerate(lines) if "Window " in ln)
    join = next(
        i for i, ln in enumerate(lines) if "BroadcastHashJoin" in ln
    )
    assert not any(
        "Exchange hashpartitioning" in ln for ln in lines[win:join]
    ), "window added an exchange over the scored rows"


def test_exact_dedup_shuffles_hash_not_text(plans):
    """The dedup exchange key is the md5 hash; raw text must not be a
    shuffle output column (at 100 TB the difference is the job)."""
    p = plans("dedup_exact")
    ex = [ln for ln in p.splitlines() if "Exchange" in ln]
    assert ex and all("text" not in ln for ln in ex)


def test_perplexity_broadcasts_counts_stays_jvm(plans):
    """text_perplexity's scale contract: no Python evaluation, the
    (token, count) vocabulary table broadcasts into the scoring join
    (the big exploded token stream is never sort-merge-shuffled for
    it), counts partial-aggregate map-side, and the single-row (n, v)
    totals side never becomes a CartesianProduct."""
    p = plans("text_perplexity")
    assert "EvalPython" not in p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "partial_count" in p


def test_q17_decorrelated_single_fact_pattern(plans):
    """Q17's correlated-average threshold must run as ONE per-part
    aggregate hash-joined back — no per-row subquery re-execution
    (no nested-loop anything) and the threshold compare stays in the
    decimal domain on the JVM."""
    p = plans("q17_small_quantity")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "EvalPython" not in p


def test_q22_anti_join_not_per_row_subquery(plans):
    """Q22's NOT EXISTS must decorrelate to an anti join; the scalar
    threshold is a one-row broadcast, not a recomputed subquery."""
    p = plans("q22_sales_opportunity")
    assert "LeftAnti" in p
    assert "EvalPython" not in p


def test_q13_outer_join_keeps_zero_order_bucket(plans):
    """Q13's LEFT OUTER must survive planning as an outer hash join
    (an inner rewrite would silently drop the c_count=0 bucket)."""
    p = plans("q13_customer_distribution")
    assert "LeftOuter" in p


def test_q21_double_decorrelation_semi_anti_pair(plans):
    """Q21's correlated EXISTS + NOT EXISTS must decorrelate to a
    LeftSemi + LeftAnti pair on l_orderkey (each one pass over its
    lineitem subset, the `l_suppkey <>` residual as join condition) —
    never a per-line subquery re-execution or a nested-loop join."""
    p = plans("q21_suppliers_waiting")
    assert "LeftSemi" in p and "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p


def test_sketch_entries_single_scan_jvm(plans):
    """The sketch contracts stay whole-stage JVM (the HLL/GK partials
    merge map-side — the property that makes sketches the 100 TB
    answer) and never expand to a per-row Python evaluation."""
    for name in ("sketch_distinct_bounds", "sketch_quantile_bounds"):
        p = plans(name)
        assert "EvalPython" not in p, name
        assert "partial_" in p, name
    # dedup-first HLL: no Expand — the exact anchor comes from the
    # distinct GROUP BY, not a fused two-phase distinct aggregate
    assert "Expand" not in plans("sketch_distinct_bounds")


def test_q17_aggregate_prefiltered_and_broadcast(plans):
    """r13 optimization pins: the per-part (cnt, total) aggregate's
    input is pre-filtered by the broadcast part list (two part scans:
    the bp filter list + the main dimension), and BOTH small sides (bp,
    pq) broadcast — the static planner must never sort-merge the fact
    table against them (the audit-scale regression the BROADCAST hints
    exist to prevent)."""
    p = plans("q17_small_quantity")
    assert p.count("part.parquet") == 2
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 3


def test_simhash_pairs_single_exchange_no_joins(plans):
    """r13 optimization pin: dedup_simhash generates pairs inside
    (lang, chunk, ck) buckets from ONE aggregation carrying the
    simhashes — no chunk self-join, no DISTINCT exchange, no broadcast
    join-backs. The only exchanges are the bucket groupBy and the
    staged kernel's widen (inside the InMemoryRelation)."""
    p = plans("dedup_simhash")
    assert "Join" not in p          # covers SortMergeJoin/BroadcastHashJoin
    assert "collect_list" in p      # the bucket aggregation
    main = p.split("InMemoryRelation")[0]  # main query above the cache
    assert main.count("Exchange") == 1

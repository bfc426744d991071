"""Randomized differential + bucket-boundary tests for
dedup_exact_substring (Lee et al. 2021 shared-window passage dedup).

The catalog entry is hash-gated by the driver, but a 1-entry gate is
thin for an operator with load-bearing bucket bounds (the r7 verdict's
directive #3): the 2..64-doc HAVING decides BOTH what exists (singleton
buckets emit nothing) and what is deliberately dropped (boilerplate
buckets past 64 docs). These tests pin the semantics against an
independent pure-Python oracle on corpora engineered to sit exactly on
those boundaries, plus randomized corpora with planted shared passages.
"""

from __future__ import annotations

import random
import re

import pytest

from dazzleduck_sql_duckdb_spark.plans import queries as Q

_N = 12  # window length, fixed in the catalog entry


def _py_windows(text: str) -> set[str]:
    """Distinct 12-token windows — independent reimplementation of the
    SQL (tokens = lowercased \\s+ split, empties dropped; windows are
    space-joined runs of 12 consecutive tokens)."""
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    return {
        " ".join(toks[i : i + _N]) for i in range(len(toks) - _N + 1)
    }


def _py_oracle(docs: dict[int, str]) -> dict[tuple[int, int], int]:
    """Brute-force shared-window pair counts with the 2..64 bucket
    bound, straight from the operator's contract."""
    buckets: dict[str, list[int]] = {}
    for doc_id, text in docs.items():
        for w in _py_windows(text):
            buckets.setdefault(w, []).append(doc_id)
    pairs: dict[tuple[int, int], int] = {}
    for ids in buckets.values():
        if not (2 <= len(ids) <= 64):
            continue
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return pairs


def _run_spark(spark, docs: dict[int, str]) -> dict[tuple[int, int], int]:
    df = spark.createDataFrame(
        [(int(i), t) for i, t in docs.items()], "doc_id long, text string"
    )
    df.createOrReplaceTempView("documents")
    rows = spark.sql(Q.spark_sql_for("dedup_exact_substring")).collect()
    return {(r.doc_a, r.doc_b): r.shared_windows for r in rows}


def _vocab_sentence(rng: random.Random, n_tokens: int) -> str:
    vocab = ["alpha", "Beta", "γάμμα", "delta-9", "x", "YZ", "longword"]
    return " ".join(rng.choice(vocab) for _ in range(n_tokens))


@pytest.fixture(scope="module", autouse=True)
def _restore_documents(spark, tables):
    """These tests overwrite the `documents` view with synthetic
    corpora; re-register the real table afterwards so later test
    modules in the same session see the parquet data."""
    yield
    from dazzleduck_sql_duckdb_spark.session import load_tables

    import tests.conftest as C

    load_tables(spark, C.SF_DIR)


def test_substring_differential_random_corpora(spark, tables):
    """Spark result == brute-force oracle on randomized corpora with
    planted shared passages, near-window-length docs, case/whitespace
    noise, and duplicated windows inside one doc."""
    for seed in (1, 7, 42):
        rng = random.Random(seed)
        passage = _vocab_sentence(rng, 20)  # >1 window wide
        docs: dict[int, str] = {}
        for i in range(40):
            kind = rng.randrange(5)
            if kind == 0:  # embeds the planted passage mid-doc
                docs[i] = (
                    _vocab_sentence(rng, rng.randrange(0, 15))
                    + " " + passage + " "
                    + _vocab_sentence(rng, rng.randrange(0, 15))
                )
            elif kind == 1:  # passage with case/whitespace perturbation
                docs[i] = "  " + passage.upper() + "\t extra tail here"
            elif kind == 2:  # too short for any window
                docs[i] = _vocab_sentence(rng, rng.randrange(0, _N))
            elif kind == 3:  # exactly one window
                docs[i] = _vocab_sentence(rng, _N)
            else:  # repeated text -> duplicate windows within the doc
                s = _vocab_sentence(rng, 14)
                docs[i] = s + " " + s
        expect = _py_oracle(docs)
        got = _run_spark(spark, docs)
        assert got == expect, f"seed {seed}: {got} != {expect}"


def test_substring_bucket_bound_is_exact(spark, tables):
    """The 2..64 HAVING sits exactly on its boundaries: a window shared
    by 64 docs contributes C(64,2) pairs; the same window shared by 65
    docs contributes nothing; a singleton contributes nothing."""
    rng = random.Random(3)
    w64 = _vocab_sentence(rng, _N)
    w65 = " ".join(f"tok{i}" for i in range(_N))
    docs: dict[int, str] = {}
    for i in range(64):  # docs 0..63 share w64 (plus unique filler)
        docs[i] = w64 + f" unique{i} " + _vocab_sentence(rng, 3)
    for i in range(65):  # docs 100..164 share w65
        docs[100 + i] = w65 + f" only{i}"
    docs[999] = _vocab_sentence(rng, 30)  # singleton windows only
    got = _run_spark(spark, docs)
    in64 = {p for p in got if p[0] < 64 and p[1] < 64}
    assert len(in64) == 64 * 63 // 2, "64-doc bucket must pair fully"
    assert all(got[p] == 1 for p in in64)
    assert not any(
        100 <= a < 200 or 100 <= b < 200 for a, b in got
    ), "65-doc bucket must be dropped whole"
    assert not any(999 in p for p in got)
    assert got == _py_oracle(docs)


def test_substring_plan_bounded_and_jvm(spark, tables):
    """Scale contract: no Python eval, no CartesianProduct or
    SortMergeJoin (pairs come from in-bucket explosion, not a self
    join), the pair source is the HAVING-bounded collect_set (the r9
    one-shuffle form: set dedup replaces the former DISTINCT
    exchange), and no exchange carries raw text or window strings
    (hashes only — the r9 window hash is a multi-arg xxhash64
    computed in-stage, pre-exchange)."""
    from dazzleduck_sql_duckdb_spark.session import load_tables

    import tests.conftest as C

    load_tables(spark, C.SF_DIR)  # the real parquet documents table
    df = spark.sql(Q.spark_sql_for("dedup_exact_substring"))
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    assert "collect_set" in p
    # ONE aggregation exchange total (the fused dedup+bucket groupBy):
    # the r8 form had two (DISTINCT, then GROUP BY wh)
    assert p.count("hashpartitioning(wh") <= 1, p
    ex = [ln for ln in p.splitlines() if "Exchange" in ln]
    assert ex, "grouping by window hash must shuffle"
    assert all("text" not in ln for ln in ex), "raw text in an exchange"
    # the window string column `g` is hashed in-stage, pre-exchange:
    # exchanges carry (doc_id, wh)/(ds) only
    assert all(" g#" not in ln for ln in ex), "window strings shuffled"

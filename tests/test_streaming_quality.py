"""Streaming perplexity filter: stateless scoring against a static LM.

The deployment shape of the CCNet filter — train once on a reference
corpus, score every incoming document statelessly (no watermark, no
state store). Tests pin: stream == batch on the same files, score
equality with the batch `text_perplexity` catalog entry (same corpus
as reference), the filter's selection semantics, and multi-batch
lifecycle (scores must not depend on which micro-batch a doc arrives
in — the property that breaks if anyone reintroduces a stream-side
aggregate)."""

from __future__ import annotations

import os
import shutil

import pytest

from dazzleduck_sql_duckdb_spark.streaming import (
    build_unigram_lm,
    perplexity_scores,
    quality_filter_stream,
    run_stream_to_memory,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

DOCS_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING,"
    " n_chars BIGINT"
)


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory, spark):
    """Documents staged as a 3-file directory so maxFilesPerTrigger=1
    exercises a genuine multi-batch stream."""
    d = tmp_path_factory.mktemp("docs_stream")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.repartition(3).write.mode("overwrite").parquet(str(d / "p"))
    return str(d / "p")


@pytest.fixture(scope="module")
def lm(spark, docs_dir):
    return build_unigram_lm(spark.read.parquet(docs_dir))


def _read_docs_stream(spark, path, max_files=None):
    r = spark.readStream.schema(DOCS_SCHEMA)
    if max_files is not None:
        r = r.option("maxFilesPerTrigger", str(max_files))
    return r.parquet(path)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_scores_equal_batch(spark, docs_dir, lm):
    batch = perplexity_scores(spark.read.parquet(docs_dir), lm)
    stream = perplexity_scores(_read_docs_stream(spark, docs_dir), lm)
    run_stream_to_memory(stream, "ppl_stream", output_mode="append")
    assert _rows(spark.table("ppl_stream")) == _rows(batch)


def test_stream_scores_match_catalog_entry(spark, tables, lm):
    """Against the batch text_perplexity entry on the SAME corpus the
    LM was trained on: the per-row fold and the explode+join+AVG
    formulation must agree at the shared 1e-6 rounding."""
    from dazzleduck_sql_duckdb_spark.plans import queries as Q

    got = _rows(perplexity_scores(spark.table("documents"), lm))
    want = _rows(spark.sql(Q.spark_sql_for("text_perplexity")))
    assert got == want


def test_filter_selection_semantics(spark, docs_dir, lm):
    scored = perplexity_scores(spark.read.parquet(docs_dir), lm)
    cut = scored.approxQuantile("avg_nll", [0.5], 0.0)[0]
    kept = quality_filter_stream(
        _read_docs_stream(spark, docs_dir), lm, max_avg_nll=cut
    )
    run_stream_to_memory(kept, "ppl_kept", output_mode="append")
    out = spark.table("ppl_kept")
    assert out.where(f"avg_nll > {cut}").count() == 0
    assert out.count() == scored.where(f"avg_nll <= {cut}").count()


def test_multibatch_scores_are_arrival_independent(spark, docs_dir, lm):
    """One file per micro-batch: every doc's score must equal the
    single-batch run's (stateless contract — no cross-batch state can
    influence a score)."""
    stream = perplexity_scores(
        _read_docs_stream(spark, docs_dir, max_files=1), lm
    )
    run_stream_to_memory(stream, "ppl_multibatch", output_mode="append")
    batch = perplexity_scores(spark.read.parquet(docs_dir), lm)
    assert _rows(spark.table("ppl_multibatch")) == _rows(batch)


def test_build_unigram_lm_cap_probes_before_collect(spark, monkeypatch):
    """r9 advisor fix: the vocab cap fires from a bounded limit(cap+1)
    probe BEFORE .collect() — an unbounded vocabulary raises instead
    of OOMing the driver."""
    import pytest as _pt

    from dazzleduck_sql_duckdb_spark.streaming import quality as QL

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1000} shared") for i in range(30)],
        "doc_id BIGINT, text STRING",
    )
    monkeypatch.setattr(QL, "MAX_LM_VOCAB", 10)
    with _pt.raises(ValueError, match="not a bounded LM"):
        QL.build_unigram_lm(docs)
    monkeypatch.setattr(QL, "MAX_LM_VOCAB", 100_000)
    lm = QL.build_unigram_lm(docs)
    assert lm.vocab_size == 61  # 30 + 30 uniques + "shared"

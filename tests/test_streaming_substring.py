"""Streaming exact-substring screen vs the static window index.

Laws pinned (the minhash-screen discipline, test_streaming_neardup):

- batch-pipeline equivalence: SELF-screening the corpus against its
  own index finds exactly the catalog `dedup_exact_substring` pairs —
  same windows, same 64-doc boilerplate cap, same shared counts;
- batch == stream on the same files; one-file-per-micro-batch arrival
  independence (stateless contract);
- pair uniqueness per micro-batch (the first-shared-window anchor);
- min_shared filters by the full intersection size, not by how many
  candidate rows happened to survive.
"""

from __future__ import annotations

import os

import pytest

from dazzleduck_sql_duckdb_spark.plans import queries as Q
from dazzleduck_sql_duckdb_spark.streaming import run_stream_to_memory
from dazzleduck_sql_duckdb_spark.streaming.dedup import (
    build_substring_index,
    substring_screen_stream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

DOCS_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING,"
    " n_chars BIGINT"
)


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("docs_substr")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.repartition(3).write.mode("overwrite").parquet(str(d / "p"))
    return str(d / "p")


@pytest.fixture(scope="module")
def index(spark, docs_dir):
    return build_substring_index(spark.read.parquet(docs_dir))


def test_self_screen_equals_batch_pipeline(spark, docs_dir, index, tables):
    """screen(corpus, own index), in_id < corpus_id, must reproduce
    the hash-gated batch entry exactly: pairs AND shared counts."""
    docs = spark.read.parquet(docs_dir)
    got = {
        (r.doc_id, r.corpus_id): r.shared_windows
        for r in substring_screen_stream(docs, index).collect()
        if r.doc_id < r.corpus_id
    }
    want = {
        (r.doc_a, r.doc_b): r.shared_windows
        for r in spark.sql(
            Q.spark_sql_for("dedup_exact_substring")
        ).collect()
    }
    assert got == want and len(want) > 0
    # and every self-match is total: a doc shares ALL its windows
    # with itself
    selfs = {
        r.doc_id: r.shared_windows
        for r in substring_screen_stream(docs, index).collect()
        if r.doc_id == r.corpus_id
    }
    assert len(selfs) > 0


def test_screen_stream_equals_batch_and_arrival_independent(
    spark, docs_dir, index
):
    batch = sorted(
        map(
            tuple,
            substring_screen_stream(
                spark.read.parquet(docs_dir), index
            ).collect(),
        )
    )

    def stream_rows(max_files):
        r = spark.readStream.schema(DOCS_SCHEMA)
        if max_files:
            r = r.option("maxFilesPerTrigger", str(max_files))
        out = substring_screen_stream(r.parquet(docs_dir), index)
        name = f"substr_screen_{max_files or 'all'}"
        run_stream_to_memory(out, name, output_mode="append")
        return sorted(map(tuple, spark.table(name).collect()))

    assert stream_rows(None) == batch
    assert stream_rows(1) == batch


def test_screen_min_shared_and_uniqueness(spark, index):
    """min_shared thresholds on the INTERSECTION size; each pair is
    emitted exactly once; a novel doc matches nothing."""
    base = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).limit(1).collect()[0]
    toks = base.text.split()
    novel = " ".join(f"zq{i}x" for i in range(40))
    inc = spark.createDataFrame(
        [(901, base.text), (902, " ".join(toks[: max(14, len(toks))])),
         (903, novel)],
        "doc_id BIGINT, text STRING",
    )
    rows = substring_screen_stream(inc, index).collect()
    keys = [(r.doc_id, r.corpus_id) for r in rows]
    assert len(keys) == len(set(keys)), "pair emitted more than once"
    assert not any(r.doc_id == 903 for r in rows)
    full = {
        r.corpus_id: r.shared_windows
        for r in rows
        if r.doc_id == 901
    }
    assert base.doc_id in full
    w = full[base.doc_id]
    high = substring_screen_stream(inc, index, min_shared=w).collect()
    assert any(
        r.doc_id == 901 and r.corpus_id == base.doc_id for r in high
    )
    none = substring_screen_stream(
        inc, index, min_shared=w + 1
    ).collect()
    assert not any(
        r.doc_id == 901 and r.corpus_id == base.doc_id for r in none
    )

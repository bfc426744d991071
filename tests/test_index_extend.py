"""extend_minhash_index exactness law: extend(build(A), B) must equal
build(A | B) — buckets, detail arrays, screen results — including
under an aggressive hot-bucket cap where the interesting transitions
happen (old-capped stays capped; a bucket crossing the cap ONLY
because of the new arrivals is dropped whole, with its band entries
re-nulled in OLD detail rows too)."""

from __future__ import annotations

import os

import pytest

from dazzleduck_sql_duckdb_spark.plans import queries as Q
from dazzleduck_sql_duckdb_spark.streaming.dedup import (
    build_minhash_index,
    extend_minhash_index,
    load_minhash_index,
    neardup_screen_stream,
    save_minhash_index,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

KNOBS = dict(
    shingle_n=Q.SHINGLE_N, a=Q.MINHASH_A, b=Q.MINHASH_B, bands=32,
)


@pytest.fixture(scope="module")
def corpora(spark):
    docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).select("doc_id", "text")
    old = docs.where("doc_id % 3 != 0")
    new = docs.where("doc_id % 3 = 0")
    return docs, old, new


def _bucket_rows(ix):
    return sorted(
        (r["corpus_id"], r["bkey"]) for r in ix.buckets.collect()
    )


def _detail_rows(ix):
    return {
        r["corpus_id"]: (sorted(r["sh"]), list(r["bkeys"]))
        for r in ix.detail.collect()
    }


def _capped_rows(ix):
    return sorted(r["bkey"] for r in ix.capped.collect())


@pytest.mark.parametrize("cap", [None, 2])
def test_extend_equals_rebuild(spark, corpora, cap):
    docs, old, new = corpora
    ext = extend_minhash_index(
        build_minhash_index(old, max_bucket_docs=cap, **KNOBS), new
    )
    full = build_minhash_index(docs, max_bucket_docs=cap, **KNOBS)
    assert _bucket_rows(ext) == _bucket_rows(full)
    assert _detail_rows(ext) == _detail_rows(full)
    if cap is not None:
        # cap=2 actually exercises every transition on this corpus
        assert len(_capped_rows(full)) > 0
        assert _capped_rows(ext) == _capped_rows(full)
        # the monotone law's interesting half: buckets capped ONLY in
        # the full index (i.e. pushed over by the new docs) exist
        old_ix = build_minhash_index(old, max_bucket_docs=cap, **KNOBS)
        assert set(_capped_rows(full)) > set(_capped_rows(old_ix))


def test_extend_screen_equals_rebuild_screen(spark, corpora):
    docs, old, new = corpora
    probe = docs.limit(60)
    ext = extend_minhash_index(
        build_minhash_index(old, max_bucket_docs=2, **KNOBS), new
    )
    full = build_minhash_index(docs, max_bucket_docs=2, **KNOBS)
    got = sorted(
        map(tuple, neardup_screen_stream(
            probe, ext, threshold_pct=80
        ).collect())
    )
    want = sorted(
        map(tuple, neardup_screen_stream(
            probe, full, threshold_pct=80
        ).collect())
    )
    assert got == want and len(got) > 0


def test_extend_after_save_load_roundtrip(spark, corpora, tmp_path):
    docs, old, new = corpora
    save_minhash_index(
        build_minhash_index(old, max_bucket_docs=2, **KNOBS),
        str(tmp_path / "ix"),
    )
    loaded = load_minhash_index(spark, str(tmp_path / "ix"))
    assert loaded.max_bucket_docs == 2 and loaded.capped is not None
    ext = extend_minhash_index(loaded, new)
    full = build_minhash_index(docs, max_bucket_docs=2, **KNOBS)
    assert _bucket_rows(ext) == _bucket_rows(full)
    assert _capped_rows(ext) == _capped_rows(full)


def test_extend_refuses_capless_record(spark, corpora):
    """A capped index without the capped-bucket record cannot be
    extended exactly — the guard must refuse loudly, not resurrect
    dropped buckets with partial membership."""
    docs, old, new = corpora
    ix = build_minhash_index(old, max_bucket_docs=2, **KNOBS)
    ix.capped = None  # simulate a legacy persisted index
    with pytest.raises(ValueError, match="rebuild"):
        extend_minhash_index(ix, new)

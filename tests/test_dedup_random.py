"""End-to-end randomized properties for the MinHash+LSH dedup pipeline.

LSH recall is probabilistic near the threshold, so exact equality with
brute force can't be a law for arbitrary corpora.  Two things ARE laws,
and together they bound the pipeline from both sides:

- **soundness**: every emitted pair's Jaccard (recomputed independently
  in pure Python over character shingles) is >= the threshold — the
  exact-verify stage admits no false positives, whatever the band
  collisions produce;
- **guaranteed recall at s=1**: two documents with identical normalized
  text have identical signatures, so EVERY band collides and the pair
  cannot be missed (P(miss) = (1 - s^r)^b = 0 at s=1).

Random corpora mix unicode, repeated copies, short strings (below the
shingle width), and near-copies with perturbations.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dazzleduck_sql_duckdb_spark.operators.dedup import minhash_neardup_pairs

P31 = 2_147_483_647
_rng = random.Random(7)
_A = [_rng.randrange(1, P31) for _ in range(32)]
_B = [_rng.randrange(0, P31) for _ in range(32)]
_N = 4  # shingle width
_THRESH = 85

_word = st.sampled_from(
    ["spark", "duck", "data", "μ-ops", "東京", "a", "  ", "row40"]
)
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


def _py_shingles(t: str) -> set[str]:
    """Character n-gram set of lower(trim-spaces(text)) — SQL substr
    semantics: a short string is its own single shingle."""
    s = t.strip(" ").lower()
    if len(s) < _N:
        return {s}
    return {s[i : i + _N] for i in range(len(s) - _N + 1)}


def _py_jaccard(a: str, b: str) -> float:
    sa, sb = _py_shingles(a), _py_shingles(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(_text, min_size=2, max_size=8),
    st.integers(min_value=0, max_value=100),
)
def test_minhash_sound_and_exact_dup_recall(spark_prop, texts, seed):
    # plant duplicates: copy some texts verbatim at new ids
    r = random.Random(seed)
    docs = list(texts)
    for _ in range(2):
        docs.append(r.choice(texts))
    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id LONG, text STRING"
    )
    got = {
        (p["doc_a"], p["doc_b"])
        for p in minhash_neardup_pairs(
            df,
            block_col=None,
            shingle_n=_N,
            a=_A,
            b=_B,
            bands=8,
            threshold_pct=_THRESH,
        ).collect()
    }
    # soundness: every emitted pair is a true near-dup by the
    # independent Python shingle arithmetic
    for i, j in got:
        assert 100 * _py_jaccard(docs[i], docs[j]) >= _THRESH, (
            i, j, docs[i], docs[j],
        )
    # guaranteed recall: identical normalized text => identical
    # signatures => some band always collides => pair MUST be found
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if docs[i].strip(" ").lower() == docs[j].strip(" ").lower():
                assert (i, j) in got, (i, j, docs[i])


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(_text, min_size=2, max_size=6),
    st.sampled_from(
        [
            # (K, bands): the production schedule shapes — including
            # bands that do NOT divide K (trailing signature rows
            # unused, the auto_bands r=7 -> b=18 case) and a
            # recall-held geometry (K = r * bands_for_recall(r)).
            (32, 8),    # r=4, divides
            (32, 5),    # r=6, 2 trailing rows unused
            (32, 3),    # r=10, 2 trailing rows unused
            (40, 20),   # r=2, wide-b
            (56, 8),    # r=7 at K=56 == r * bands_for_recall-ish
        ]
    ),
)
def test_minhash_laws_hold_across_banding_schedules(
    spark_prop, texts, shape
):
    """The soundness + s=1-recall laws are SCHEDULE-INVARIANT: they
    must hold at every (K, bands) the production rules can emit —
    including bands that don't divide K, where the kernel uses only
    the first bands*r signature rows (make_shingle_sig_udf)."""
    k, bands = shape
    a, b = _A[:k] if k <= len(_A) else None, _B[:k] if k <= len(_B) else None
    if a is None or len(a) < k:
        rng = random.Random(k)
        a = [rng.randrange(1, P31) for _ in range(k)]
        b = [rng.randrange(0, P31) for _ in range(k)]
    docs = list(texts) + [texts[0]]  # plant one exact dup
    df = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id LONG, text STRING"
    )
    got = {
        (p["doc_a"], p["doc_b"])
        for p in minhash_neardup_pairs(
            df, block_col=None, shingle_n=_N,
            a=a, b=b, bands=bands, threshold_pct=_THRESH,
        ).collect()
    }
    for i, j in got:
        assert 100 * _py_jaccard(docs[i], docs[j]) >= _THRESH
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if docs[i].strip(" ").lower() == docs[j].strip(" ").lower():
                assert (i, j) in got


def test_recall_schedule_math():
    """bands_for_recall really delivers the promised per-pair recall,
    and the auto_bands fixed-K schedule's documented decay numbers are
    the true S-curve values (the r5 ADVICE contract)."""
    from dazzleduck_sql_duckdb_spark.operators.dedup import (
        auto_bands,
        bands_for_recall,
        minhash_pair_recall,
    )

    for r in range(2, 13):
        b = bands_for_recall(r, threshold=0.85, min_recall=0.99)
        assert minhash_pair_recall(r, b, 0.85) >= 0.99
        assert minhash_pair_recall(r, b - 1, 0.85) < 0.99 or b == 1
    # documented decay points of the fixed-K=128 schedule
    assert round(minhash_pair_recall(7, 18, 0.85), 4) == 0.9990
    assert round(minhash_pair_recall(8, 16, 0.85), 4) == 0.9938
    assert round(minhash_pair_recall(10, 12, 0.85), 4) == 0.9280
    assert round(minhash_pair_recall(12, 10, 0.85), 4) == 0.7844
    # auto_bands returns k // r for the documented sizes
    assert auto_bands(5_000, 128) == 128 // 7
    assert auto_bands(50_000, 128) == 128 // 8
    assert auto_bands(500_000, 128) == 128 // 10
    assert auto_bands(50_000_000, 128) == 128 // 12

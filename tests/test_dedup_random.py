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

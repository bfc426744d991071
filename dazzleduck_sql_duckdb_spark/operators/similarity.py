"""Similarity search over embedding columns: exact top-k and IVF ANN.

Beyond the reference's surface (it has no vector operators) — these are
the training-data-pipeline operators the engine adds, designed for the
100 TB contract:

- **Brute-force cosine top-k** (the correctness baseline): broadcast the
  (small) query set against the full corpus — one pass, no shuffle of
  the corpus, exact. Cost O(|corpus| * |queries| * dim): fine for
  evaluation samples, not for all-pairs at scale.
- **IVF (inverted-file) ANN** (the scale path): sample + Lloyd-refine
  coarse centroids (driver holds only `n_centroids * dim` floats — the
  classic IVF coarse quantizer, bounded regardless of corpus size),
  assign every vector to its nearest centroid (one numpy pandas-UDF pass,
  no shuffle), then probe only the `n_probe` nearest cells per query:
  the candidate join is an equi-join on `cell`, so Spark hash-partitions
  by cell instead of broadcasting the corpus. Search cost drops by
  ~n_centroids/n_probe; recall is tunable with n_probe (n_probe ==
  n_centroids degrades gracefully to exact).
- **Embedding near-dup pairs via sign-LSH**: random-hyperplane SimHash
  bits, banded buckets, exact cosine verify — same
  candidates-then-verify shape as MinHash dedup (operators/dedup.py),
  never the n^2 pair space.

All kernels are numpy over Arrow batches (pandas UDFs); dot products on
unit-normalized vectors equal cosine similarity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_matrix(series: pd.Series, dim: int) -> np.ndarray:
    return np.vstack(
        [np.asarray(v, dtype=np.float64) for v in series]
    ) if len(series) else np.empty((0, dim))


def make_fold_dot_udf():
    """Arrow-batched dot product with the SEQUENTIAL fold's float
    semantics: acc_0 = 0.0, acc_{j+1} = acc_j + q_j * v_j in IEEE
    double, left to right — the exact operation order of both the SQL
    twin (list fold in plans/dialect.py) and the Catalyst
    aggregate(zip_with(...)) expression this replaces, so results are
    bit-identical and the DuckDB oracle hashes still match. The fold is
    vectorized ACROSS the batch (dim numpy ops per batch instead of an
    interpreted per-row per-element lambda): measured, the interpreted
    HOF was the dominant term of the IVF rerank at 10M candidates —
    one straggler task ground >15 min; this kernel does the same rows
    in seconds."""

    @F.pandas_udf(T.DoubleType())
    def fold_dot(q: pd.Series, v: pd.Series) -> pd.Series:
        if not len(q):
            return pd.Series([], dtype="float64")
        Q = np.vstack([np.asarray(x, dtype=np.float64) for x in q])
        V = np.vstack([np.asarray(x, dtype=np.float64) for x in v])
        acc = np.zeros(len(Q), dtype=np.float64)
        for j in range(Q.shape[1]):
            acc = acc + Q[:, j] * V[:, j]
        return pd.Series(acc)

    return fold_dot


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _partition_local_topk(
    scored: DataFrame, query_id_col: str, id_col: str, k: int
) -> DataFrame:
    """Map-side top-k: inside EACH partition of the scored-candidates
    stream, keep only the k best rows per query (same (sim desc, id
    asc) order as the final window), with a bounded carry compacted
    batch-by-batch. No shuffle is introduced — mapInPandas runs on the
    input's existing partitioning — so the global top-k window that
    follows sorts at most n_partitions * n_queries * k rows instead of
    the full candidate stream. Without this, a 625M-row candidate set
    (250k vectors x 2500 queries, full probe) funneled straight into
    one row_number window — a single straggler task sorting for >15
    minutes; the window is exact either way, this just prunes what it
    has to sort. The classic tree-aggregated top-k."""
    schema = scored.schema

    def run(batches):
        carry = None
        for pdf in batches:
            combined = (
                pdf if carry is None
                else pd.concat([carry, pdf], ignore_index=True)
            )
            carry = (
                combined.sort_values(
                    ["sim", id_col], ascending=[False, True],
                    kind="mergesort",
                )
                .groupby(query_id_col, sort=False)
                .head(k)
            )
        if carry is not None and len(carry):
            yield carry

    return scored.mapInPandas(run, schema=schema)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x corpus, deterministic
    double-fold dot product, per-query window top-k.

    Scale shape: corpus is never shuffled; the only exchange is the
    final per-query top-k (tiny). Matches the SQL twin in
    plans/queries.py (embed_knn_bruteforce).
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qe")
    )
    e = corpus.select(F.col(id_col), F.col(vec_col))
    # exclude_self drops id == qid pairs (queries drawn from the corpus
    # under one id namespace); with exclude_self=False every corpus row
    # is a candidate — ids colliding across namespaces must NOT be
    # dropped, so the join condition is unconditionally true there
    cond = (
        F.col(id_col) != F.col(query_id_col) if exclude_self else F.lit(True)
    )
    joined = e.join(F.broadcast(q), cond)
    fold_dot = make_fold_dot_udf()
    scored = joined.select(
        query_id_col,
        id_col,
        fold_dot(F.col("__qe"), F.col(vec_col)).alias("sim"),
    )
    local = _partition_local_topk(scored, query_id_col, id_col, k)
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.col(id_col)
    )
    return (
        local.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


# ------------------------------------------------------------------ IVF


def train_centroids(
    corpus: DataFrame,
    n_centroids: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 2,
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer: deterministic corpus sample as seeds, then
    `iterations` distributed Lloyd steps (assignment is a numpy UDF pass;
    the mean-update is a posexplode + groupBy — one bounded shuffle of
    n_rows*dim scalars, never the vectors to the driver)."""
    sample = (
        corpus.select(vec_col)
        .orderBy(F.pmod(F.xxhash64(F.col(id_col)) + seed, F.lit(2**31 - 1)))
        .limit(n_centroids)
        .collect()
    )
    cents = _normalize(
        np.vstack([np.asarray(r[0], dtype=np.float64) for r in sample])
    )
    for _ in range(iterations):
        assign = make_assign_udf(cents)
        assigned = corpus.select(
            assign(F.col(vec_col)).alias("cell"),
            F.posexplode(F.col(vec_col)).alias("pos", "val"),
        )
        means = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("mm"))
            .select("cell", F.transform("mm", lambda s: s.m).alias("mean"))
            .collect()
        )
        new = cents.copy()
        for r in means:
            new[r.cell] = np.asarray(r.mean, dtype=np.float64)
        cents = _normalize(new)
    return cents


def make_assign_udf(centroids: np.ndarray):
    """vector -> nearest-centroid id (cosine), one matmul per Arrow batch."""
    C = _normalize(np.asarray(centroids, dtype=np.float64))
    dim = C.shape[1]

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="int32")
        M = _normalize(_as_matrix(vecs, dim))
        return pd.Series((M @ C.T).argmax(axis=1).astype("int32"))

    return assign


def make_multi_assign_udf(centroids: np.ndarray, spill: int):
    """vector -> its `spill` nearest cell ids (SPANN-style boundary
    replication: a vector near a Voronoi boundary is indexed in every
    close cell, so a query probing either side still finds it). Storage
    grows by the spill factor; recall at a fixed probe fraction rises
    sharply because coarse-quantization boundary loss is the dominant
    IVF error term."""
    C = _normalize(np.asarray(centroids, dtype=np.float64))
    dim = C.shape[1]
    spill = max(1, min(spill, C.shape[0]))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def multi_assign(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="object")
        M = _normalize(_as_matrix(vecs, dim))
        sims = M @ C.T
        idx = np.argsort(-sims, axis=1)[:, :spill].astype("int32")
        return pd.Series(list(idx))

    return multi_assign


def make_probe_udf(centroids: np.ndarray, n_probe: int):
    """query vector -> its n_probe nearest cell ids."""
    C = _normalize(np.asarray(centroids, dtype=np.float64))
    dim = C.shape[1]
    n_probe = min(n_probe, C.shape[0])

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="object")
        M = _normalize(_as_matrix(vecs, dim))
        sims = M @ C.T
        idx = np.argsort(-sims, axis=1)[:, :n_probe].astype("int32")
        return pd.Series(list(idx))

    return probe


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    n_centroids: int | None = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    centroids: np.ndarray | None = None,
    train_iterations: int = 2,
    seed: int = 42,
    spill: int = 1,
) -> DataFrame:
    """IVF ANN: probe n_probe cells per query, exact rerank inside them.

    At 100 TB the assigned corpus is a table partitioned/bucketed by
    `cell`; queries explode to (query, cell) and the candidate join is
    cell-co-located — no broadcast of the corpus, no all-pairs.
    `spill > 1` replicates each corpus vector into its `spill` nearest
    cells (boundary replication): index storage grows spill-fold, query
    cost per probed cell grows ~spill-fold, recall at a fixed n_probe
    rises sharply. The duplicate (query, candidate) pairs a spilled
    index produces are collapsed before the rerank window.

    ``n_centroids=None`` auto-sizes the index to ~sqrt(N) cells
    (clamped to [4, 65536]) — the classical IVF balance point where
    both the coarse-quantizer scan and the per-probe candidate list
    stay O(sqrt(N)). The fixed-count default suits the test scale;
    production callers should pass None (or a measured value).
    """
    if centroids is None:
        if n_centroids is None:
            n = corpus.count()
            n_centroids = max(4, min(65_536, int(round(n ** 0.5))))
        centroids = train_centroids(
            corpus, n_centroids, vec_col=vec_col, id_col=id_col,
            iterations=train_iterations, seed=seed,
        )
    probe = make_probe_udf(centroids, n_probe)

    if spill > 1:
        massign = make_multi_assign_udf(centroids, spill)
        assigned = corpus.select(
            F.col(id_col), F.col(vec_col),
            F.explode(massign(F.col(vec_col))).alias("cell"),
        )
    else:
        assign = make_assign_udf(centroids)
        assigned = corpus.select(
            F.col(id_col), F.col(vec_col),
            assign(F.col(vec_col)).alias("cell"),
        )
    probed = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qe"),
        F.explode(probe(F.col(vec_col))).alias("cell"),
    )
    # BROADCAST the probed query side: the corpus then never shuffles.
    # `cell` has only n_centroids distinct values, so a shuffled
    # hash-join on it is intrinsically skewed (AQE coalescing made one
    # task carry a hot cell's whole candidate stream at 250k vectors);
    # with the small side broadcast, every corpus partition streams its
    # own vectors against the probe table and work stays balanced by
    # the scan partitioning. Queries are the evaluation sample in this
    # operator's contract (cosine_topk makes the same assumption) —
    # a giant query set should be chunked by the caller.
    cand = assigned.join(
        F.broadcast(probed),
        on=[assigned.cell == probed.cell,
            F.col(id_col) != F.col(query_id_col)],
    )
    fold_dot = make_fold_dot_udf()
    scored = cand.select(
        query_id_col,
        F.col(id_col),
        fold_dot(F.col("__qe"), F.col(vec_col)).alias("sim"),
    )
    if spill > 1:
        # the same (query, candidate) pair surfaces once per shared
        # spilled cell with an IDENTICAL sim — dedup AFTER scoring, so
        # only (id, id, double) rows reach the exchange, never vectors.
        # (Duplicates would also survive map-side pruning: identical
        # rows rank adjacently, so the local-top-k cutoff stays exact
        # after this dedup.)
        scored = scored.groupBy(query_id_col, id_col).agg(
            F.max("sim").alias("sim")
        )
    local = _partition_local_topk(scored, query_id_col, id_col, k)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        local.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


# ------------------------------------------------ sign-LSH near-dup pairs


def make_signbits_udf(dim: int, n_bits: int = 64, seed: int = 20260813):
    """Random-hyperplane SimHash: 64 sign bits packed into a BIGINT."""
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((dim, n_bits))
    weights = (1 << np.arange(n_bits, dtype=np.uint64)).astype(np.uint64)

    @F.pandas_udf(T.LongType())
    def signbits(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="int64")
        M = _as_matrix(vecs, dim)
        bits = (M @ H) > 0
        packed = (bits.astype(np.uint64) * weights).sum(axis=1)
        return pd.Series(packed.astype(np.int64))

    return signbits


def embed_neardup_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.99,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    dim: int = 64,
    n_bits: int = 64,
    bands: int = 8,
    seed: int = 20260813,
) -> DataFrame:
    """Candidate pairs from banded sign-bits, exact cosine verify.

    Approximate-recall scale path of `embed_cosine_neardup` (the exact
    SQL twin in plans/queries.py is the oracle-checked baseline); at
    cos >= 0.99 a band of 8 bits all-matches with p ~ 0.69, so >= 1 of 8
    bands collides with p ~ 1 - 8.5e-5.
    """
    bits_per_band = n_bits // bands
    mask = (1 << bits_per_band) - 1
    signbits = make_signbits_udf(dim, n_bits, seed)
    blk = F.col(block_col) if block_col else F.lit(0)
    sigs = corpus.select(
        F.col(id_col), F.col(vec_col), blk.alias("blk"),
        signbits(F.col(vec_col)).alias("sig"),
    ).persist()
    bands_df = sigs.select(
        id_col, "blk",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "sig",
    ).select(
        id_col, "blk", "band",
        F.expr(f"(sig >> (band * {bits_per_band})) & {mask}").alias("bkey"),
    )
    x, y = bands_df.alias("x"), bands_df.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.blk") == F.col("y.blk"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("vec_a"),
            F.col(f"y.{id_col}").alias("vec_b"),
        )
        .distinct()
    )
    a = sigs.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("__ea"))
    b = sigs.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("__eb"))
    dot = F.aggregate(
        F.zip_with(
            "__ea", "__eb", lambda p, r: p.cast("double") * r.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(a, "vec_a").join(b, "vec_b")
        .select("vec_a", "vec_b", dot.alias("sim"))
        .where(F.col("sim") >= threshold)
    )

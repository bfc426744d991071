"""Connected components: near-dup pairs -> dedup clusters.

The last step of a dedup pipeline: LSH emits *pairs*, but retention
policy needs *groups* ("keep one doc per component"). Components are an
iterative fixpoint — a class of algorithm the reference engine has no
way to express (its host SQL has recursion only DuckDB-side).

Implementation: min-label propagation with pointer doubling. Every
node starts labeled with itself; each round, a node takes the min
among (its own label, its neighbors' labels, its label's label). The
neighbor term floods one hop per round; the label-of-label term
("shortcutting", the doubling step of classic parallel CC /
Hash-to-Min) halves the pointer depth per round, so convergence is
O(log diameter) rounds instead of O(diameter) — a 1M-node path needs
~20 rounds, not 1M. Invariant: a node's label is always a node
reachable from it (labels only flow along edges or through reachable
labels), so the fixpoint is exactly the min reachable node.

Scale notes:
- each round is two equi-joins (edges x labels on node id, labels x
  labels on label id) and one min-aggregation — no driver-side graph
  state, only a scalar convergence check per round;
- `localCheckpoint` cuts the lineage each round (iterative plans
  otherwise grow exponentially and overwhelm the optimizer);
- for graphs with high-degree hubs, the same salting strategy as
  operators/skew.py applies to the label join;
- exhausting ``max_iterations`` raises instead of silently returning
  half-propagated labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iterations: int = 25,
) -> DataFrame:
    """(src, dst) undirected edge list -> (node, component), component =
    the minimum node id reachable; only nodes appearing in edges are
    emitted."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    label_t = labels.schema["label"].dataType
    converged = False
    for rnd in range(max_iterations):
        # carry each node's previous label through the aggregation (one
        # non-null `old` per node) so convergence detection is a free
        # filter over the checkpointed result instead of an extra
        # labels-to-labels shuffle join per round
        nbr = sym.join(labels, sym["b"] == labels["node"]).select(
            F.col("a").alias("node"),
            F.col("label"),
            F.lit(None).cast(label_t).alias("old"),
        )
        cur = labels.select("node", "label", F.col("label").alias("old"))
        parts = cur.unionByName(nbr)
        if rnd > 0:
            # pointer doubling: every label is itself a node in `labels`
            # (min over node ids), so label(label(x)) is one inner join.
            # Skipped in round 0 where labels == identity (jump would be
            # a no-op join).
            jump = (
                labels.alias("x")
                .join(labels.alias("y"), F.col("x.label") == F.col("y.node"))
                .select(
                    F.col("x.node").alias("node"),
                    F.col("y.label").alias("label"),
                    F.lit(None).cast(label_t).alias("old"),
                )
            )
            parts = parts.unionByName(jump)
        new = (
            parts.groupBy("node")
            .agg(F.min("label").alias("label"), F.min("old").alias("old"))
            .localCheckpoint()  # cut lineage: keeps round N's plan flat
        )
        changed = new.where(F.col("label") != F.col("old")).count()
        labels = new.select("node", "label")
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (graph diameter > 2^iterations is impossible — "
            "this indicates label oscillation, i.e. a bug)"
        )
    return labels.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("label").cast("long").alias("component"),
    )

"""Connected components: near-dup pairs -> dedup clusters.

The last step of a dedup pipeline: LSH emits *pairs*, but retention
policy needs *groups* ("keep one doc per component"). Components are an
iterative fixpoint — a class of algorithm the reference engine has no
way to express (its host SQL has recursion only DuckDB-side).

Implementation: min-label propagation. Every node starts labeled with
itself; each round, a node takes the min label among itself and its
neighbors; converges in O(graph diameter) rounds (near-dup clusters are
shallow — diameter 1-3 in practice).

Scale notes:
- each round is one equi-join (edges x labels, shuffle on node id) and
  one min-aggregation — no driver-side graph state, only a scalar
  convergence check per round;
- `localCheckpoint` cuts the lineage each round (iterative plans
  otherwise grow exponentially and overwhelm the optimizer);
- for graphs with high-degree hubs, the same salting strategy as
  operators/skew.py applies to the label join.
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
    for _ in range(max_iterations):
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
        new = (
            cur.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.min("old").alias("old"))
            .localCheckpoint()  # cut lineage: keeps round N's plan flat
        )
        changed = new.where(F.col("label") != F.col("old")).count()
        labels = new.select("node", "label")
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("label").cast("long").alias("component"),
    )

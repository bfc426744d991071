"""Randomized differential for connected_components: Spark min-label
propagation (+ pointer doubling) vs a pure-Python union-find — a
different algorithm computing the same fixpoint.  Random graphs reach
what the fixed cases can't: cycles touching chains, duplicate and
self-loop edges, several components interleaved on the same id range.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dazzleduck_sql_duckdb_spark.operators.components import (
    connected_components,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min node of the component (the operator's contract)
    return {n: find(n) for n in parent}


_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ),
    min_size=1,
    max_size=16,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_edges)
def test_components_match_union_find(spark_prop, edges):
    df = spark_prop.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _union_find(edges)


def test_long_chain_converges_logarithmically(spark_prop):
    """A 60-node path has diameter 59: plain one-hop propagation would
    exhaust max_iterations=25 and (before the convergence guard) return
    half-propagated labels.  Pointer doubling contracts it in O(log n)
    rounds, so the full chain collapses to component 0 well within the
    default budget."""
    n = 60
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark_prop.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == {i: 0 for i in range(n)}

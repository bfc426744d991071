"""Randomized differential for the remote aggregation-pushdown builder.

`dd_read_arrow_agg` emits the reference's rewrite template
(``SELECT <aggs> FROM (<orig>) AS _subq [WHERE] [GROUP BY]``) and runs
the aggregate server-side (src/optimizer/aggregation_pushdown.cpp:
247-418 behavior).  The reference's own oracle is "pushdown equals
local execution" over fixed queries; this module randomizes it:
random aggregate sets (count(*)/count/sum/min/max/avg/count DISTINCT —
exactly the reference's supported set, aggregation_pushdown.cpp:
206-209) over random columns, optional GROUP BY and WHERE, compared
against Spark executing the *same SQL text* on the parquet directly.
Engine-vs-engine: DuckDB computes the pushed aggregate on the server,
Spark computes the local twin; values must agree (floats to 1e-9
relative — avg over DOUBLE is association-order-dependent; DuckDB
sum(BIGINT) arrives as DECIMAL(38,0) where Spark's is LONG, so cells
are compared numerically, not by type).
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dazzleduck_sql_duckdb_spark.sources import register
from dazzleduck_sql_duckdb_spark.sources.arrow_http import dd_read_arrow_agg
from dazzleduck_sql_duckdb_spark.sources.local_server import ArrowTestServer

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
ORDERS = os.path.join(SF_DIR, "orders.parquet")

_NUM = ["o_orderkey", "o_custkey", "o_totalprice"]

_agg_expr = st.one_of(
    st.just("count(*)"),
    st.builds(lambda c: f"count({c})", st.sampled_from(_NUM)),
    st.builds(lambda c: f"sum({c})", st.sampled_from(_NUM)),
    st.builds(lambda c: f"min({c})", st.sampled_from(_NUM)),
    st.builds(lambda c: f"max({c})", st.sampled_from(_NUM)),
    st.builds(lambda c: f"avg({c})", st.sampled_from(_NUM)),
    st.builds(
        lambda c: f"count(DISTINCT {c})",
        st.sampled_from(_NUM + ["o_orderstatus"]),
    ),
)
_aggs = st.lists(_agg_expr, min_size=1, max_size=4, unique=True).map(
    lambda exprs: {f"a{i}": e for i, e in enumerate(exprs)}
)
_group = st.sampled_from([None, ["o_orderstatus"], ["o_orderpriority"]])
# simple comparisons valid verbatim in both dialects; the all-false
# branch exercises the empty-set aggregate laws end-to-end
_where = st.sampled_from(
    [
        None,
        "o_totalprice > 150000",
        "o_orderkey < 500",
        "o_orderstatus = 'O'",
        "o_custkey < 0",
    ]
)


@pytest.fixture(scope="module")
def server():
    with ArrowTestServer({"orders": ORDERS}) as srv:
        yield srv


@pytest.fixture(scope="module")
def registered(spark):
    register(spark)
    return spark


def _num_or_none(v):
    if isinstance(v, Decimal):
        return float(v)
    return v


def _cells_equal(a, b):
    a, b = _num_or_none(a), _num_or_none(b)
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_aggs, _group, _where)
def test_agg_pushdown_equals_local_spark(registered, server, aggs, grp, whr):
    pushed = dd_read_arrow_agg(
        registered,
        server.url,
        source_table="orders",
        aggs=aggs,
        group_by=grp,
        where=whr,
    ).collect()

    keys = list(grp or [])
    select = ", ".join(
        keys + [f"{expr} AS {alias}" for alias, expr in aggs.items()]
    )
    local_sql = f"SELECT {select} FROM parquet.`{ORDERS}`"
    if whr:
        local_sql += f" WHERE {whr}"
    if keys:
        local_sql += " GROUP BY " + ", ".join(keys)
    local = registered.sql(local_sql).collect()

    skey = lambda r: tuple(repr(r[k]) for k in keys)  # noqa: E731
    pushed, local = sorted(pushed, key=skey), sorted(local, key=skey)
    assert len(pushed) == len(local)
    cols = keys + list(aggs)
    for pr, lr in zip(pushed, local):
        for c in cols:
            assert _cells_equal(pr[c], lr[c]), (
                f"{c}: server={pr[c]!r} local={lr[c]!r} "
                f"(aggs={aggs}, grp={grp}, where={whr})"
            )


# ---- split mode: per-split server-side partials + Spark-side merge ----

_safe_agg_expr = st.one_of(
    st.just("count(*)"),
    st.builds(lambda c: f"count({c})", st.sampled_from(_NUM)),
    st.builds(lambda c: f"sum({c})", st.sampled_from(_NUM)),
    st.builds(lambda c: f"min({c})", st.sampled_from(_NUM)),
    st.builds(lambda c: f"max({c})", st.sampled_from(_NUM)),
)
_safe_aggs = st.lists(_safe_agg_expr, min_size=1, max_size=3, unique=True).map(
    lambda exprs: {f"a{i}": e for i, e in enumerate(exprs)}
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_safe_aggs, _group, _where)
def test_split_agg_partials_equal_local(registered, server, aggs, grp, whr):
    """Split mode: EACH split computes the aggregate over its slice on
    the server and Spark merges the partials (the reference's split-mode
    aggregation pushdown, IsSplitSafe set only).  Merged result must
    equal Spark computing the same SQL locally."""
    merged = dd_read_arrow_agg(
        registered,
        server.url,
        source_table="orders",
        aggs=aggs,
        group_by=grp,
        where=whr,
        split=True,
        split_size=16384,  # several splits at sf0.001
    ).collect()

    keys = list(grp or [])
    select = ", ".join(
        keys + [f"{expr} AS {alias}" for alias, expr in aggs.items()]
    )
    local_sql = f"SELECT {select} FROM parquet.`{ORDERS}`"
    if whr:
        local_sql += f" WHERE {whr}"
    if keys:
        local_sql += " GROUP BY " + ", ".join(keys)
    local = registered.sql(local_sql).collect()

    skey = lambda r: tuple(repr(r[k]) for k in keys)  # noqa: E731
    merged, local = sorted(merged, key=skey), sorted(local, key=skey)
    assert len(merged) == len(local)
    for mr, lr in zip(merged, local):
        for c in keys + list(aggs):
            assert _cells_equal(mr[c], lr[c]), (
                f"{c}: split-merged={mr[c]!r} local={lr[c]!r} "
                f"(aggs={aggs}, grp={grp}, where={whr})"
            )


def test_split_agg_partials_ran_server_side(registered, server):
    server.queries.clear()
    out = dd_read_arrow_agg(
        registered,
        server.url,
        source_table="orders",
        aggs={"n": "count(*)", "s": "sum(o_totalprice)"},
        split=True,
        split_size=16384,
    ).collect()
    assert len(out) == 1
    # every split's wire query carries BOTH the slice predicate and the
    # aggregate — the partials really ran on the server, per split
    wire = [q for q in server.queries if "hash(_b)" in q]
    assert len(wire) >= 2, f"expected >=2 split queries, saw {server.queries}"
    assert all("count(*)" in q and "sum(o_totalprice)" in q for q in wire)
    # schema is probed ONCE and reused across splits: exactly one
    # LIMIT-0 round trip regardless of split count
    probes = [q for q in server.queries if "LIMIT 0" in q]
    assert len(probes) == 1, f"expected 1 schema probe, saw {probes}"


def test_split_agg_rejects_unsafe_aggregates(registered, server):
    """avg / DISTINCT partials don't merge — the IsSplitSafe contract
    (one unsafe aggregate fails the whole call, like the reference's
    whole-query fallback)."""
    for bad in ({"a": "avg(o_totalprice)"}, {"d": "count(DISTINCT o_custkey)"}):
        with pytest.raises(ValueError, match="not split-safe"):
            dd_read_arrow_agg(
                registered,
                server.url,
                source_table="orders",
                aggs={"n": "count(*)", **bad},
                split=True,
            )

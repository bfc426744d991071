"""Randomized filter-pushdown differential for the dd_read_arrow source.

The fixed-predicate tests pin known shapes (LIKE escaping, the
mixed pushable/unpushable contract).  This module generates random
predicate trees — comparisons over ints/doubles/strings, IS [NOT]
NULL, LIKE with metacharacters, timestamp bounds, an unpushable
residual — and asserts that the remote scan (whatever subset of the
predicate Spark's pushFilters hands the source, serialized to server
SQL, with the residual re-applied locally) returns exactly the rows a
direct parquet scan does.  Pushdown is an optimization, never a
semantic change, for EVERY predicate — the reference's own fallback
contract (SURVEY.md §3.3) made universal.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dazzleduck_sql_duckdb_spark.sources import dd_read_arrow, register
from dazzleduck_sql_duckdb_spark.sources.local_server import ArrowTestServer

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
ORDERS = os.path.join(SF_DIR, "orders.parquet")

_NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
_CMP = ["<", "<=", ">", ">=", "=", "!="]

_num_atom = st.builds(
    lambda c, op, v: f"{c} {op} {v}",
    st.sampled_from(_NUM_COLS),
    st.sampled_from(_CMP),
    st.one_of(
        st.integers(min_value=0, max_value=2000),
        st.floats(
            min_value=0, max_value=300000, allow_nan=False, width=32
        ).map(lambda f: round(f, 2)),
    ),
)
_str_atom = st.builds(
    lambda op, v: f"o_orderstatus {op} '{v}'",
    st.sampled_from(["=", "!=", "<", ">"]),
    st.sampled_from(["O", "F", "P", "X", ""]),
)
_null_atom = st.builds(
    lambda c, neg: f"{c} IS {'NOT ' if neg else ''}NULL",
    st.sampled_from(_NUM_COLS + ["o_orderstatus"]),
    st.booleans(),
)
_like_atom = st.builds(
    lambda p: f"o_orderpriority LIKE '{p}'",
    st.sampled_from(["%URGENT%", "1%", "%H", "_-%", "%100%", "2-HIGH"]),
)
_ts_atom = st.builds(
    lambda op, d: f"o_orderdate {op} TIMESTAMP '{d}'",
    st.sampled_from(["<", ">=", ">"]),
    st.sampled_from(
        ["1995-01-01 00:00:00", "1997-06-15 12:00:00", "1992-01-01 00:00:00"]
    ),
)
# never serializable by the source -> must stay a local residual
_unpushable_atom = st.builds(
    lambda k: f"pmod(o_orderkey, {k}) = 0",
    st.integers(min_value=2, max_value=5),
)

_atom = st.one_of(
    _num_atom, _str_atom, _null_atom, _like_atom, _ts_atom, _unpushable_atom
)
_pred = st.lists(_atom, min_size=1, max_size=3).flatmap(
    lambda atoms: st.sampled_from([" AND ", " OR "]).map(
        lambda op: "(" + op.join(atoms) + ")"
    )
)


@pytest.fixture(scope="module")
def server():
    with ArrowTestServer({"orders": ORDERS}) as srv:
        yield srv


@pytest.fixture(scope="module")
def registered(spark):
    register(spark)
    return spark


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_pred)
def test_random_predicate_pushdown_equals_direct(registered, server, pred):
    remote = sorted(
        map(
            repr,
            dd_read_arrow(registered, server.url, source_table="orders")
            .where(pred)
            .collect(),
        )
    )
    direct = sorted(
        map(repr, registered.read.parquet(ORDERS).where(pred).collect())
    )
    assert remote == direct

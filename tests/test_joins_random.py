"""Randomized cross-engine differentials for the temporal joins.

The gate already checks `events_orders_asof_join` / `events_activity_
range_join` against DuckDB's *native* ASOF JOIN / IEJoin on the fixed
testdata.  These tests run the same engine-vs-engine comparison over
hypothesis-generated tables, hammering the zones fixed data can't
reach systematically: time ties (left==right, right==right after
dedup), NULL times on both sides, negative timestamps (floor-division
sign behavior in the bin computation), empty sides, and single-key
pileups.  The oracle is a different algorithm in a different engine —
the strongest kind of differential (SURVEY.md §5).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dazzleduck_sql_duckdb_spark.operators.joins import (
    asof_join,
    range_join_binned,
)

# small domains force collisions: few keys, tight time range, NULLs
_key = st.integers(min_value=0, max_value=2)
_time = st.one_of(st.none(), st.integers(min_value=-6, max_value=12))

_left_rows = st.lists(st.tuples(_key, _time), max_size=14)
_right_rows = st.lists(st.tuples(_key, _time), max_size=14)


def _frames(lrows, rrows):
    """(left, right) pandas frames with row-index ids; right deduped on
    (k, rt) so the greatest-time winner is unique (the operator's
    documented determinism precondition)."""
    left = pd.DataFrame(
        {
            "k": pd.array([k for k, _ in lrows], dtype="int64"),
            "lt": pd.array([t for _, t in lrows], dtype="Int64"),
            "lid": pd.array(range(len(lrows)), dtype="int64"),
        }
    )
    rdedup: dict[tuple, int] = {}
    for i, (k, t) in enumerate(rrows):
        rdedup.setdefault((k, t), i)
    right = pd.DataFrame(
        {
            "k": pd.array([k for k, _ in rdedup], dtype="int64"),
            "rt": pd.array([t for _, t in rdedup], dtype="Int64"),
            "rid": pd.array(list(rdedup.values()), dtype="int64"),
        }
    )
    return left, right


_SCHEMA_L = "k LONG, lt LONG, lid LONG"
_SCHEMA_R = "k LONG, rt LONG, rid LONG"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_left_rows, _right_rows)
def test_asof_matches_duckdb_native(spark_prop, lrows, rrows):
    left_pd, right_pd = _frames(lrows, rrows)
    got = asof_join(
        spark_prop.createDataFrame(left_pd, _SCHEMA_L),
        spark_prop.createDataFrame(right_pd, _SCHEMA_R),
        "k",
        left_time="lt",
        right_time="rt",
    ).collect()

    # DuckDB's native ASOF orders NULL as the LARGEST time (a NULL left
    # time matches the greatest right time; a NULL right time is matched
    # by a NULL left time).  The operator's documented contract is
    # predicate semantics instead — `rt <= lt` is never true with a NULL
    # on either side (pandas merge_asof / polars join_asof behave the
    # same) — so the oracle encodes that policy explicitly: NULL right
    # times are excluded from matching, NULL-lt left rows keep NULL
    # payloads.  The matching core (greatest rt <= lt per key, ties,
    # backward-inclusive) is still DuckDB's own ASOF algorithm.
    con = duckdb.connect()
    con.register("l", left_pd)
    con.register("r", right_pd)
    want = con.execute(
        "SELECT l.k, l.lid,"
        " CASE WHEN l.lt IS NULL THEN NULL ELSE r.rid END AS rid"
        " FROM l ASOF LEFT JOIN (SELECT * FROM r WHERE rt IS NOT NULL) r"
        " ON l.k = r.k AND r.rt <= l.lt"
    ).fetchall()
    con.close()

    g = sorted((r["k"], r["lid"], r["rid"]) for r in got)
    w = sorted((k, lid, rid) for k, lid, rid in want)
    assert g == w


_window = st.tuples(
    st.integers(min_value=-7, max_value=7),
    st.integers(min_value=-7, max_value=7),
).map(lambda p: (min(p), max(p)))


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_left_rows, _right_rows, _window)
def test_range_join_matches_duckdb_predicate(spark_prop, lrows, rrows, win):
    lower, upper = win
    left_pd, right_pd = _frames(lrows, rrows)
    got = range_join_binned(
        spark_prop.createDataFrame(left_pd, _SCHEMA_L),
        spark_prop.createDataFrame(right_pd, _SCHEMA_R),
        "k",
        left_time="lt",
        right_time="rt",
        lower=lower,
        upper=upper,
    ).collect()

    con = duckdb.connect()
    con.register("l", left_pd)
    con.register("r", right_pd)
    want = con.execute(
        "SELECT l.lid, r.rid FROM l JOIN r ON l.k = r.k"
        " AND r.rt >= l.lt + ? AND r.rt <= l.lt + ?",
        [lower, upper],
    ).fetchall()
    con.close()

    g = sorted((r["lid"], r["rid"]) for r in got)
    w = sorted(want)
    assert g == w


def test_asof_null_right_time_is_never_matched(spark_prop):
    """The regression the randomized differential first caught: a right
    row with NULL time sorts NULLS-FIRST ahead of every real row, and
    without the explicit filter its payload leaks into the carry-forward
    of every left row that has no real predecessor.  SQL ASOF semantics
    (r.rt <= l.lt) can never match a NULL."""
    trades = spark_prop.createDataFrame(
        [(1, 10, "t-a")], "sym INT, t BIGINT, trade STRING"
    )
    quotes = spark_prop.createDataFrame(
        [(1, None, 99.0)], "sym INT, qt BIGINT, px DOUBLE"
    )
    out = asof_join(
        trades, quotes, "sym", left_time="t", right_time="qt"
    ).collect()
    assert [r["px"] for r in out] == [None]

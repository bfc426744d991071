"""Aggregate x type correctness matrix vs the DuckDB oracle.

Pytest port of the reference's typed-matrix strategy
(/root/reference/test/sql/dd_read_arrow_all_types_split_comprehensive.test_slow:17-386
and dd_read_arrow_aggregation_pushdown.test_slow:186-390, via SURVEY.md §5):
every aggregate over every numeric width, with NULL rows mixed in, plus the
NULL/empty-set laws — identical values from Spark and DuckDB over the same
rows.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import pytest

D = decimal.Decimal
ROWS = [
    # (i8, i16, i32, i64, f32, f64, dec42, dec92, dec184, dec3810, s)
    (1, 100, 10_000, 1_000_000, 1.5, 2.5,
     D("12.34"), D("12.345"), D("12.3456"), D("12.3456789012"), "alpha"),
    (2, -50, -20_000, -5_000_000, -0.25, 7.75,
     D("-4.10"), D("-4.100"), D("-4.1000"), D("-4.1000000001"), "beta"),
    (None, None, None, None, None, None, None, None, None, None, None),
    (127, 32_000, 2_000_000_000, 4_000_000_000_000, 3.125, -1.5,
     D("99.99"), D("999999.999"), D("99999999999999.9999"),
     D("999999999999999999.9999999999"), "alpha"),
    (-128, -32_000, -2_000_000_000, -4_000_000_000_000, 0.5, 0.0,
     D("0.01"), D("0.001"), D("0.0001"), D("0.0000000001"), "gamma"),
]

# the reference's four decimal widths (SURVEY.md §2.9: internal storage
# int16/int32/int64/hugeint by width) alongside every integer/float width
DDL_COLS = (
    "i8 TINYINT, i16 SMALLINT, i32 INT, i64 BIGINT, "
    "f32 FLOAT, f64 DOUBLE, dec42 DECIMAL(4,2), dec92 DECIMAL(9,3), "
    "dec184 DECIMAL(18,4), dec3810 DECIMAL(38,10), s STRING"
)

# (aggregate template, result cast) — cast unifies Spark/DuckDB result
# types (DuckDB sum(int) is HUGEINT, Spark's is LONG, etc.;
# SURVEY.md §7.4).
# (aggregate template, result cast, float rel tolerance). The moment
# aggregates compare at 1e-9 rel — the bound the 4x10 cells were
# probed at before pinning (r12 advice #5: the compare previously
# asserted 1e-12, a tolerance 1000x tighter than the probed bound, so
# a Welford-vs-textbook accumulation difference inside the documented
# envelope after an engine version bump would have flaked the
# matrix). Everything else stays at 1e-12 (exact-sum shapes).
AGGS = [
    ("count(*)", "BIGINT", 1e-12),
    ("count({c})", "BIGINT", 1e-12),
    ("count(DISTINCT {c})", "BIGINT", 1e-12),
    ("min({c})", None, 1e-12),
    ("max({c})", None, 1e-12),
    ("sum({c})", "DECIMAL(38,10)", 1e-12),
    ("avg({c})", "DOUBLE", 1e-12),
    # moment aggregates (r12 widening): explicit _samp/_pop names are
    # ANSI-shared; both engines return DOUBLE.
    ("stddev_samp({c})", "DOUBLE", 1e-9),
    ("stddev_pop({c})", "DOUBLE", 1e-9),
    ("var_samp({c})", "DOUBLE", 1e-9),
    ("var_pop({c})", "DOUBLE", 1e-9),
]

NUMERIC_COLS = ["i8", "i16", "i32", "i64", "f32", "f64",
                "dec42", "dec92", "dec184", "dec3810"]


@pytest.fixture(scope="module")
def engines(spark):
    df = spark.createDataFrame(ROWS, schema=DDL_COLS.replace(" STRING", " STRING"))
    df.createOrReplaceTempView("all_types")
    con = duckdb.connect()
    con.sql(f"CREATE TABLE all_types ({DDL_COLS.replace('STRING', 'VARCHAR')})")
    for r in ROWS:
        con.execute(
            "INSERT INTO all_types VALUES (?,?,?,?,?,?,?,?,?,?,?)", list(r)
        )
    return spark, con


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _check(spark, con, expr_sql: str, rel: float = 1e-12):
    got = _norm(spark.sql(f"SELECT {expr_sql} FROM all_types").collect()[0][0])
    want = _norm(con.sql(f"SELECT {expr_sql} FROM all_types").fetchall()[0][0])
    if isinstance(got, float) and isinstance(want, float):
        assert got == pytest.approx(want, rel=rel), expr_sql
    else:
        assert got == want, expr_sql


@pytest.mark.parametrize("col", NUMERIC_COLS)
@pytest.mark.parametrize("agg,cast,rel", AGGS)
def test_agg_type_matrix(engines, col, agg, cast, rel):
    spark, con = engines
    expr = agg.format(c=col)
    if cast:
        expr = f"CAST({expr} AS {cast})"
    _check(spark, con, expr, rel=rel)


@pytest.mark.parametrize("agg,cast,rel", AGGS)
def test_varchar_aggs(engines, agg, cast, rel):
    if any(k in agg for k in ("sum", "avg", "stddev", "var_")):
        pytest.skip("no numeric aggregates over VARCHAR")
    spark, con = engines
    _check(spark, con, agg.format(c="s") if not cast else
           f"CAST({agg.format(c='s')} AS {cast})")


# two-column moment aggregates (r12 verdict optional-hardening #6a —
# the one aggregate family previously untested cross-engine). Pairs
# mix widths/signs and include the NULL-carrying columns, so the
# pairwise-deletion law (a row counts only when BOTH args are
# non-NULL) is exercised; 1e-9 rel per the moment-aggregate envelope.
TWO_COL_PAIRS = [("i8", "i16"), ("i32", "f64"), ("i64", "dec92"),
                 ("f32", "dec184"), ("dec42", "dec3810")]


@pytest.mark.parametrize("fn", ["covar_samp", "covar_pop", "corr"])
@pytest.mark.parametrize("a,b", TWO_COL_PAIRS)
def test_two_column_moment_aggs(engines, fn, a, b):
    spark, con = engines
    _check(spark, con, f"CAST({fn}({a}, {b}) AS DOUBLE)", rel=1e-9)


def test_null_laws(engines):
    """count(*) includes NULLs, count(col) excludes, sum/min/max ignore."""
    spark, con = engines
    for expr in [
        "CAST(count(*) AS BIGINT)",
        "CAST(count(i32) AS BIGINT)",
        "CAST(sum(i32) AS BIGINT)",
        "min(i32)",
        "max(i32)",
    ]:
        _check(spark, con, expr)


def test_empty_set_laws(engines):
    """Empty input: count -> 0, sum/min/max/avg -> NULL."""
    spark, con = engines
    where = " WHERE i32 > 2000000000000"
    for expr in [
        "CAST(count(*) AS BIGINT)",
        "CAST(sum(i32) AS BIGINT)",
        "min(i32)",
        "max(i32)",
        "CAST(avg(i32) AS DOUBLE)",
    ]:
        got = spark.sql(f"SELECT {expr} FROM all_types{where}").collect()[0][0]
        want = con.sql(f"SELECT {expr} FROM all_types{where}").fetchall()[0][0]
        assert _norm(got) == _norm(want), expr


def test_group_by_matches(engines):
    spark, con = engines
    q = (
        "SELECT s, CAST(count(*) AS BIGINT) n, CAST(sum(i64) AS DECIMAL(38,0)) sm"
        " FROM all_types GROUP BY s ORDER BY s NULLS FIRST"
    )
    got = [tuple(_norm(v) for v in r) for r in spark.sql(q).collect()]
    want = [tuple(_norm(v) for v in r) for r in con.sql(q).fetchall()]
    assert got == want

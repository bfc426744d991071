"""Differential expression fuzzer: seed-fixed random expression trees
evaluated by Spark SQL and DuckDB over an identical NULL-bearing
fixture, asserting value-identical results.

The dual-dialect catalog (plans/queries.py) proves parity for the
~124 HAND-WRITTEN queries; this fuzzer sweeps the expression space
BETWEEN them — nested arithmetic, three-valued boolean logic, CASE /
COALESCE / NULLIF, string functions — so a divergence in the shared
SQL subset the catalog relies on (e.g. a NULL-propagation or
collation difference) fails the suite even if no catalog entry
happens to exercise that corner.

Grammar restrictions are the documented dialect boundary, not
laziness — each is a place the engines genuinely DIVERGE and the
catalog must (and does) avoid or bridge with dialect.py helpers:
  * no division / modulo   (x/0: Spark NULL, DuckDB error)
  * no unbounded products  (overflow: Spark wraps, DuckDB raises;
                            operands here are bounded so every
                            intermediate fits comfortably in int64)
  * no float arithmetic    (hash/repr instability; catalog bridges
                            via the DECIMAL round-then-DOUBLE rule)
  * no sum() over the int fixture without CAST (HUGEINT vs LONG —
                            dialect.bigsum exists for exactly this)

Seed is FIXED: the suite is deterministic and a failure is
reproducible by expression index. 120 scalar + 40 aggregate trees.
"""

from __future__ import annotations

import random

import duckdb
import pytest

# ------------------------------------------------------------ fixture

ROWS = [
    # (id, i, j, s)  — j and s carry NULLs; strings mix case/len
    (0, 3, 5, "alpha"),
    (1, -4, None, "Bravo"),
    (2, 0, -2, ""),
    (3, 5, 0, "charlie delta"),
    (4, -1, 3, None),
    (5, 2, None, "Echo"),
    (6, -5, -5, "foxtrot"),
    (7, 4, 1, "GOLF"),
    (8, 1, -3, None),
    (9, -2, 4, "hotel  "),
]


def _spark_view(spark):
    df = spark.createDataFrame(
        ROWS, schema="id BIGINT, i BIGINT, j BIGINT, s STRING"
    )
    df.createOrReplaceTempView("fuzz_t")


def _duck_table():
    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz_t (id BIGINT, i BIGINT, j BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO fuzz_t VALUES (?, ?, ?, ?)", ROWS)
    return con


# ------------------------------------------------------------ grammar
#
# Typed generators: int_expr / bool_expr / str_expr, depth-bounded.
# Every emitted construct is ANSI shared between Spark SQL and DuckDB.


def int_expr(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        return rng.choice(["i", "j", "id", str(rng.randint(-3, 3))])
    pick = rng.randrange(8)
    if pick < 3:
        op = rng.choice(["+", "-", "*"])
        return f"({int_expr(rng, depth - 1)} {op} {int_expr(rng, depth - 1)})"
    if pick == 3:
        return (
            f"(CASE WHEN {bool_expr(rng, depth - 1)}"
            f" THEN {int_expr(rng, depth - 1)}"
            f" ELSE {int_expr(rng, depth - 1)} END)"
        )
    if pick == 4:
        return f"COALESCE({int_expr(rng, depth - 1)}, {int_expr(rng, depth - 1)})"
    if pick == 5:
        return f"NULLIF({int_expr(rng, depth - 1)}, {int_expr(rng, depth - 1)})"
    if pick == 6:
        fn = rng.choice(["greatest", "least"])
        return f"{fn}({int_expr(rng, depth - 1)}, {int_expr(rng, depth - 1)})"
    return f"abs({int_expr(rng, depth - 1)})"


def bool_expr(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        op = rng.choice(["<", "<=", "=", "<>", ">", ">="])
        return f"({int_expr(rng, 0)} {op} {int_expr(rng, 0)})"
    pick = rng.randrange(6)
    if pick == 0:
        return f"({bool_expr(rng, depth - 1)} AND {bool_expr(rng, depth - 1)})"
    if pick == 1:
        return f"({bool_expr(rng, depth - 1)} OR {bool_expr(rng, depth - 1)})"
    if pick == 2:
        return f"(NOT {bool_expr(rng, depth - 1)})"
    if pick == 3:
        col = rng.choice(["i", "j", "s"])
        neg = rng.choice(["", " NOT"])
        return f"({col} IS{neg} NULL)"
    if pick == 4:
        op = rng.choice(["<", "<=", "=", "<>", ">", ">="])
        return f"({int_expr(rng, depth - 1)} {op} {int_expr(rng, depth - 1)})"
    # string equality/inequality — binary collation in both engines
    op = rng.choice(["=", "<>"])
    return f"({str_expr(rng, depth - 1)} {op} {str_expr(rng, depth - 1)})"


def str_expr(rng: random.Random, depth: int) -> str:
    if depth <= 0:
        return rng.choice(["s", "'k'", "'Zeta'", "''"])
    pick = rng.randrange(6)
    if pick == 0:
        return f"upper({str_expr(rng, depth - 1)})"
    if pick == 1:
        return f"lower({str_expr(rng, depth - 1)})"
    if pick == 2:
        return f"trim({str_expr(rng, depth - 1)})"
    if pick == 3:
        # 1-based start, bounded positive length: identical semantics
        return (
            f"substr({str_expr(rng, depth - 1)},"
            f" {rng.randint(1, 3)}, {rng.randint(0, 4)})"
        )
    if pick == 4:
        return f"({str_expr(rng, depth - 1)} || {str_expr(rng, depth - 1)})"
    return f"COALESCE({str_expr(rng, depth - 1)}, {str_expr(rng, depth - 1)})"


def scalar_column(rng: random.Random, alias: str) -> str:
    kind = rng.randrange(3)
    if kind == 0:
        body = int_expr(rng, rng.randint(2, 4))
        return f"CAST({body} AS BIGINT) AS {alias}"
    if kind == 1:
        body = bool_expr(rng, rng.randint(2, 3))
        return f"CAST({body} AS BOOLEAN) AS {alias}"
    body = str_expr(rng, rng.randint(2, 4))
    return f"CAST({body} AS STRING) AS {alias}"


def scalar_select(rng: random.Random, width: int = 4) -> str:
    """width expressions per round-trip: the Spark fixed per-query cost
    (~0.4s scheduler/codegen) dominates a 10-row evaluation, so
    batching 4-wide keeps the sweep 4x faster at identical coverage."""
    cols = ", ".join(scalar_column(rng, f"v{k}") for k in range(width))
    return f"SELECT id, {cols} FROM fuzz_t"


def agg_select(rng: random.Random, width: int = 4) -> str:
    """Aggregates over generated scalars, grouped by sign(i) — partial
    aggregation + merge on both engines. length() bridges the str case
    to an int domain so min/max avoid collation-order questions.
    width bodies share one round-trip (see scalar_select)."""
    cols = []
    for k in range(width):
        kind = rng.randrange(3)
        if kind == 0:
            body = int_expr(rng, rng.randint(1, 3))
        elif kind == 1:
            body = f"(CASE WHEN {bool_expr(rng, 2)} THEN 1 ELSE 0 END)"
        else:
            body = f"length({str_expr(rng, 2)})"
        cols.append(
            f"CAST(count({body}) AS BIGINT) AS c{k},\n"
            f"  CAST(sum({body}) AS BIGINT) AS sm{k},\n"
            f"  CAST(min({body}) AS BIGINT) AS mn{k},\n"
            f"  CAST(max({body}) AS BIGINT) AS mx{k}"
        )
    joined = ",\n  ".join(cols)
    return f"""
SELECT (CASE WHEN i < 0 THEN 'neg' ELSE 'pos' END) AS grp,
  {joined}
FROM fuzz_t GROUP BY (CASE WHEN i < 0 THEN 'neg' ELSE 'pos' END)
"""


# ------------------------------------------------------------- tests


def _norm(rows):
    out = []
    for r in rows:
        out.append(tuple(bool(v) if isinstance(v, bool) else v for v in r))
    return sorted(out, key=repr)


@pytest.fixture(scope="module")
def engines(spark):
    _spark_view(spark)
    con = _duck_table()
    yield spark, con
    con.close()


def _run_both(engines, sql: str):
    spark, con = engines
    got = _norm([tuple(r) for r in spark.sql(sql).collect()])
    want = _norm(con.execute(sql).fetchall())
    return got, want


def test_scalar_expression_fuzz(engines):
    rng = random.Random(0x5F3759DF)
    for idx in range(30):  # x4-wide = 120 expression trees
        sql = scalar_select(rng)
        got, want = _run_both(engines, sql)
        assert got == want, f"scalar divergence at batch #{idx}:\n{sql}\nspark={got}\nduck={want}"


def test_aggregate_expression_fuzz(engines):
    rng = random.Random(0xBADC0FFE)
    for idx in range(10):  # x4-wide = 40 aggregate bodies
        sql = agg_select(rng)
        got, want = _run_both(engines, sql)
        assert got == want, f"aggregate divergence at batch #{idx}:\n{sql}\nspark={got}\nduck={want}"

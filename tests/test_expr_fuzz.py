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
laziness — each is a place where generated SQL stops being comparable
across engines (asserted as executable facts in
test_dialect_boundaries.py):
  * no division / modulo   (x/0: Spark 4's ANSI default RAISES,
                            DuckDB returns NULL — a random zero
                            divisor is a hard divergence)
  * no unbounded products  (int64 overflow raises in BOTH under
                            ANSI — aborting the comparison — and
                            Spark wraps silently with ANSI off;
                            operands here are bounded so every
                            intermediate fits comfortably in int64)
  * no float arithmetic    (hash/repr instability; catalog bridges
                            via the DECIMAL round-then-DOUBLE rule)
  * no sum() over the int fixture without CAST (HUGEINT vs LONG —
                            dialect.bigsum exists for exactly this)
  * NULLS FIRST/LAST always explicit in ORDER BY (the defaults
                            genuinely diverge: Spark ASC puts NULLs
                            first, DuckDB last)

Seed is FIXED: the suite is deterministic and a failure is
reproducible by expression index. 120 scalar + 40 aggregate trees.
"""

from __future__ import annotations

import random

import duckdb
import pytest

# ------------------------------------------------------------ fixture

ROWS_B = [
    # (id, k, m, u) — the join partner; k/m overlap ROWS' i/j value
    # ranges so equi-joins hit, and carry NULLs (never match)
    (0, 3, None, "alpha"),
    (1, 3, 2, "zulu"),
    (2, None, -2, "Bravo"),
    (3, -4, 0, None),
    (4, 5, 5, "echo"),
    (5, 0, None, ""),
    (6, 2, -5, "yankee"),
    (7, 2, 1, "GOLF"),
]

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
    df_b = spark.createDataFrame(
        ROWS_B, schema="id BIGINT, k BIGINT, m BIGINT, u STRING"
    )
    df_b.createOrReplaceTempView("fuzz_b")


def _duck_table():
    con = duckdb.connect()
    con.execute("CREATE TABLE fuzz_t (id BIGINT, i BIGINT, j BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO fuzz_t VALUES (?, ?, ?, ?)", ROWS)
    con.execute("CREATE TABLE fuzz_b (id BIGINT, k BIGINT, m BIGINT, u VARCHAR)")
    con.executemany("INSERT INTO fuzz_b VALUES (?, ?, ?, ?)", ROWS_B)
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


# -------------------------------------------------------- join fuzz
#
# Random equi-joins (inner/left/right/full) with NULL-bearing keys and
# generated residual predicates, plus correlated EXISTS / NOT EXISTS —
# NULL-key non-matching, outer-side NULL fill, and three-valued
# residual evaluation are the classic cross-engine divergence spots.
# Semi/anti run as EXISTS (ANSI shared) — Spark's LEFT SEMI/ANTI
# keywords aren't DuckDB syntax; the planner lowers EXISTS to the same
# semi/anti joins (pinned by the catalog's q4/q21/q22 plan evidence).

_A_INT = ["a.i", "a.j", "a.id"]
_B_INT = ["b.k", "b.m", "b.id"]


def _qual_cmp(rng: random.Random) -> str:
    op = rng.choice(["<", "<=", "=", "<>", ">", ">="])
    lhs = rng.choice(_A_INT + [str(rng.randint(-3, 3))])
    rhs = rng.choice(_B_INT + [str(rng.randint(-3, 3))])
    return f"({lhs} {op} {rhs})"


def _residual(rng: random.Random) -> str:
    parts = [_qual_cmp(rng) for _ in range(rng.randint(1, 2))]
    glue = rng.choice([" AND ", " OR "])
    body = glue.join(parts)
    if rng.random() < 0.3:
        col = rng.choice(_A_INT + _B_INT)
        body += f" AND ({col} IS NOT NULL)"
    return f"({body})"


def join_select(rng: random.Random) -> str:
    jt = rng.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
    on = f"a.{rng.choice(['i', 'j'])} = b.{rng.choice(['k', 'm'])}"
    if rng.random() < 0.5:
        on += f" AND {_residual(rng)}"
    return (
        "SELECT a.id AS aid, b.id AS bid, a.i, a.j, b.k, b.m"
        f" FROM fuzz_t a {jt} fuzz_b b ON {on}"
    )


def _exists_cmp(rng: random.Random) -> str:
    """Like _qual_cmp but outer-side references are NON-NULL columns
    only (a.i, a.id — never a.j): DuckDB 1.0.0's decorrelation
    mishandles a NULL outer column in a correlated inequality (it
    returns the row where three-valued logic says no witness exists
    — Spark is right). The bug is pinned, with the lift condition, in
    test_dialect_boundaries.py; found by this fuzzer's deep sweep."""
    op = rng.choice(["<", "<=", "=", "<>", ">", ">="])
    lhs = rng.choice(["a.i", "a.id", str(rng.randint(-3, 3))])
    rhs = rng.choice(_B_INT + [str(rng.randint(-3, 3))])
    return f"({lhs} {op} {rhs})"


def exists_select(rng: random.Random) -> str:
    neg = rng.choice(["EXISTS", "NOT EXISTS"])
    corr = f"b.{rng.choice(['k', 'm'])} = a.{rng.choice(['i', 'j'])}"
    extra = ""
    if rng.random() < 0.6:
        # correlated inequality (the q4/q21 decorrelation shape)
        extra = f" AND {_exists_cmp(rng)}"
    return (
        "SELECT a.id, a.i, a.j FROM fuzz_t a"
        f" WHERE {neg} (SELECT 1 FROM fuzz_b b WHERE {corr}{extra})"
    )


# ------------------------------------------------------ window fuzz
#
# Frame semantics (ROWS bounds), rank functions, and lag/lead defaults
# over NULL-bearing partitions. ORDER BY the unique id keeps every
# window total-ordered, so results are deterministic in both engines
# (ties under a non-unique ORDER BY would make row_number legitimately
# engine-dependent — that is a real dialect boundary, same reason the
# catalog's window entries always order by a key suffix).

_FRAMES = [
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
]

_PARTS = ["(i > 0)", "(j IS NULL)", "(s IS NULL)", "(id >= 5)"]


def win_column(rng: random.Random, alias: str) -> str:
    part = rng.choice(_PARTS)
    over = f"OVER (PARTITION BY {part} ORDER BY id"
    pick = rng.randrange(4)
    if pick == 0:
        agg = rng.choice(["sum", "min", "max", "count"])
        body = int_expr(rng, rng.randint(1, 2))
        frame = rng.choice(_FRAMES)
        return f"CAST({agg}({body}) {over} {frame}) AS BIGINT) AS {alias}"
    if pick == 1:
        fn = rng.choice(["row_number()", "rank()", "dense_rank()"])
        return f"CAST({fn} {over}) AS BIGINT) AS {alias}"
    if pick == 2:
        fn = rng.choice(["lag", "lead"])
        body = int_expr(rng, 1)
        off = rng.randint(1, 2)
        return f"CAST({fn}({body}, {off}) {over}) AS BIGINT) AS {alias}"
    body = int_expr(rng, 1)
    return (
        f"CAST(first_value({body}) {over}"
        f" {rng.choice(_FRAMES)}) AS BIGINT) AS {alias}"
    )


def win_select(rng: random.Random, width: int = 4) -> str:
    cols = ", ".join(win_column(rng, f"v{k}") for k in range(width))
    return f"SELECT id, {cols} FROM fuzz_t"


def test_window_fuzz(engines):
    rng = random.Random(0xF1A5C0DE)
    for idx in range(10):  # x4-wide = 40 window expressions
        sql = win_select(rng)
        got, want = _run_both(engines, sql)
        assert got == want, f"window divergence at batch #{idx}:\n{sql}\nspark={got}\nduck={want}"


# ------------------------------------------------------ order fuzz
#
# ORDER BY + LIMIT compared ORDER-SENSITIVELY (the other tests sort
# before comparing; top-k selection semantics only show up if the
# order itself is checked). NULLS FIRST/LAST is always explicit: the
# DEFAULTS genuinely diverge (Spark ASC puts NULLs first, DuckDB
# last) — that is a documented dialect boundary the catalog's ORDER
# BY entries bridge the same way, not a fuzzable shared behavior.
# The unique id suffix totalizes every ordering.


def order_select(rng: random.Random) -> str:
    body = int_expr(rng, rng.randint(1, 3))
    dir1 = rng.choice(["ASC", "DESC"])
    nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
    dir2 = rng.choice(["ASC", "DESC"])
    k = rng.randint(1, len(ROWS))
    return (
        f"SELECT id, CAST({body} AS BIGINT) AS v FROM fuzz_t"
        f" ORDER BY v {dir1} {nulls}, id {dir2} LIMIT {k}"
    )


def test_order_by_limit_fuzz(engines):
    spark, con = engines
    rng = random.Random(0x0DDBA11)
    for idx in range(30):
        sql = order_select(rng)
        got = [tuple(r) for r in spark.sql(sql).collect()]
        want = [tuple(r) for r in con.execute(sql).fetchall()]
        assert got == want, f"order divergence at #{idx}:\n{sql}\nspark={got}\nduck={want}"


def test_join_fuzz(engines):
    rng = random.Random(0x7E57DA7A)
    for idx in range(25):
        sql = join_select(rng)
        got, want = _run_both(engines, sql)
        assert got == want, f"join divergence at #{idx}:\n{sql}\nspark={got}\nduck={want}"


def test_exists_fuzz(engines):
    rng = random.Random(0xACC01ADE)
    for idx in range(15):
        sql = exists_select(rng)
        got, want = _run_both(engines, sql)
        assert got == want, f"exists divergence at #{idx}:\n{sql}\nspark={got}\nduck={want}"


# ------------------------------------------------------ set-op fuzz
#
# UNION / INTERSECT / EXCEPT in both DISTINCT and ALL (bag) forms over
# generated typed arms — NULL-equality in set-op semantics (standard:
# NULLs compare equal here, unlike WHERE), bag-difference counting,
# and cross-arm type alignment. The right arm reads fuzz_b through a
# column-remap subquery so both generator vocabularies resolve while
# the NULL patterns differ across arms.

SETOPS = ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
          "EXCEPT", "EXCEPT ALL"]


def setop_select(rng: random.Random) -> str:
    op = rng.choice(SETOPS)
    left = int_expr(rng, rng.randint(1, 3))
    right = int_expr(rng, rng.randint(1, 3))
    ls = str_expr(rng, 2)
    rs = str_expr(rng, 2)
    return (
        f"SELECT CAST({left} AS BIGINT) AS v, length({ls}) AS w"
        f" FROM fuzz_t {op} "
        f"SELECT CAST({right} AS BIGINT) AS v, length({rs}) AS w"
        f" FROM (SELECT id, k AS i, m AS j, u AS s FROM fuzz_b) _rb"
    )


def test_setop_fuzz(engines):
    rng = random.Random(0x5E70B5ED)
    for idx in range(30):
        sql = setop_select(rng)
        got, want = _run_both(engines, sql)
        assert got == want, (
            f"setop divergence at #{idx}:\n{sql}\nspark={got}\nduck={want}"
        )


# ------------------------------------------------------ having fuzz
#
# GROUP BY a generated int expression (NULL keys group together on
# both engines) with a generated HAVING over aggregates — the
# post-aggregation filter path (partial agg -> merge -> filter), and
# count(*) vs count(expr) NULL-skipping under the same predicate.


def having_select(rng: random.Random) -> str:
    grp = int_expr(rng, 2)
    body = int_expr(rng, rng.randint(1, 3))
    aux = int_expr(rng, 2)
    cmp_op = rng.choice([">", "<", ">=", "<=", "<>", "="])
    thresh = rng.randint(-5, 5)
    having = rng.choice([
        f"count(*) {cmp_op} {abs(thresh)}",
        f"CAST(sum({aux}) AS BIGINT) {cmp_op} {thresh}",
        f"CAST(min({aux}) AS BIGINT) {cmp_op} CAST(max({aux}) AS BIGINT)",
    ])
    return (
        f"SELECT CAST({grp} AS BIGINT) AS g,"
        f" CAST(count({body}) AS BIGINT) AS c,"
        f" CAST(sum({body}) AS BIGINT) AS sm,"
        f" CAST(min({body}) AS BIGINT) AS mn,"
        f" CAST(max({body}) AS BIGINT) AS mx"
        f" FROM fuzz_t GROUP BY CAST({grp} AS BIGINT) HAVING {having}"
    )


def test_having_fuzz(engines):
    rng = random.Random(0x6A71B06F)
    for idx in range(30):
        sql = having_select(rng)
        got, want = _run_both(engines, sql)
        assert got == want, (
            f"having divergence at #{idx}:\n{sql}\nspark={got}\nduck={want}"
        )


# ------------------------------------------- grouping-analytics fuzz
#
# ROLLUP / CUBE / GROUPING SETS over NULL-bearing keys with
# grouping() markers — the ninth family (r13). The NULL-key rows are
# the point: a super-aggregate NULL and a NULL group key are
# indistinguishable without grouping(), so any divergence in how the
# engines expand the sets or mark the synthetic rows flips ga/gb or
# merges rows that must stay distinct.


def groupsets_select(rng: random.Random) -> str:
    a, b = rng.sample(["i", "j", "s"], 2)
    form = rng.choice([
        f"ROLLUP ({a}, {b})",
        f"CUBE ({a}, {b})",
        f"GROUPING SETS (({a}, {b}), ({a}), ())",
        f"GROUPING SETS (({a}), ({b}))",
    ])
    body = int_expr(rng, rng.randint(1, 3))
    return (
        f"SELECT {a} AS ka, {b} AS kb,"
        f" CAST(grouping({a}) AS BIGINT) AS ga,"
        f" CAST(grouping({b}) AS BIGINT) AS gb,"
        f" CAST(count(*) AS BIGINT) AS c,"
        f" CAST(sum({body}) AS BIGINT) AS sm"
        f" FROM fuzz_t GROUP BY {form}"
    )


def test_groupsets_fuzz(engines):
    rng = random.Random(0x6E0517)
    for idx in range(30):
        sql = groupsets_select(rng)
        got, want = _run_both(engines, sql)
        assert got == want, (
            f"groupsets divergence at #{idx}:\n{sql}\nspark={got}\nduck={want}"
        )

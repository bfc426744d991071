"""dd_array_contains_all semantics — pytest port of the reference's pure
SQLLogicTests (/root/reference/test/sql/array_contains_all.test:7-173 laws,
via SURVEY.md §2.5 F1-F3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dazzleduck_sql_duckdb_spark.functions import (
    dd_array_contains_all,
    register_all,
)
from dazzleduck_sql_duckdb_spark.functions.bloom import bloom_create_py

ARR = T.ArrayType(T.StringType())
SCHEMA = T.StructType(
    [T.StructField("h", ARR), T.StructField("n", ARR)]
)

CASES = [
    # (haystack, needle, expected)
    (["a", "b", "c"], ["a", "b"], True),
    (["a", "b"], ["a", "b", "c"], False),
    (["a", "b"], [], True),                    # empty needle -> true
    ([], ["a"], False),                        # empty haystack + needle -> false
    ([], [], True),
    (None, ["a"], None),                       # NULL haystack -> NULL
    (["a"], None, None),                       # NULL needle -> NULL
    (None, None, None),
    (["a", None, "b"], ["b"], True),           # NULL elements skipped
    (["a"], ["a", None], True),                # NULL needle element skipped
    ([None], [None], True),                    # all-NULL needle == empty
    ([None], ["a"], False),
    (["A"], ["a"], False),                     # case-sensitive
]


def _run_column_api(spark, cases):
    df = spark.createDataFrame(
        [(h, n) for h, n, _ in cases], schema=SCHEMA
    )
    return [
        r[0]
        for r in df.select(dd_array_contains_all("h", "n")).collect()
    ]


def test_column_api_semantics(spark):
    got = _run_column_api(spark, CASES)
    assert got == [e for _, _, e in CASES]


def test_sql_function_semantics(spark):
    register_all(spark)
    df = spark.createDataFrame([(h, n) for h, n, _ in CASES], schema=SCHEMA)
    df.createOrReplaceTempView("aca_cases")
    got = [
        r[0]
        for r in spark.sql(
            "SELECT dd_array_contains_all(h, n) FROM aca_cases"
        ).collect()
    ]
    assert got == [e for _, _, e in CASES]


def test_hint_overload_matches(spark):
    """Third boolean arg is an execution hint only — same results."""
    register_all(spark)
    df = spark.createDataFrame([(h, n) for h, n, _ in CASES], schema=SCHEMA)
    df.createOrReplaceTempView("aca_cases")
    for flag in ("true", "false"):
        got = [
            r[0]
            for r in spark.sql(
                f"SELECT dd_array_contains_all_hint(h, n, {flag})"
                " FROM aca_cases"
            ).collect()
        ]
        assert got == [e for _, _, e in CASES]


@pytest.mark.parametrize(
    "haystack,needle,expected",
    [
        (["a", "b", "c"], ["a", "b"], True),
        (["a", "b"], ["z"], False),          # bloom definite miss
        (["a", "b"], [], True),
        (["a", None], ["a"], True),
    ],
)
def test_bloom_overload(spark, haystack, needle, expected):
    bf = bloom_create_py([x for x in haystack if x is not None])
    df = spark.createDataFrame(
        [(haystack, needle, bf)],
        schema=T.StructType(
            [
                T.StructField("h", ARR),
                T.StructField("n", ARR),
                T.StructField("bf", T.BinaryType()),
            ]
        ),
    )
    got = df.select(dd_array_contains_all("h", "n", "bf")).collect()[0][0]
    assert got == expected


def test_bloom_overload_malformed_blob_is_null(spark):
    df = spark.createDataFrame(
        [(["a"], ["a"], b"\x00\x01")],
        schema=T.StructType(
            [
                T.StructField("h", ARR),
                T.StructField("n", ARR),
                T.StructField("bf", T.BinaryType()),
            ]
        ),
    )
    got = df.select(dd_array_contains_all("h", "n", "bf")).collect()[0][0]
    assert got is None


def test_dd_search_accepts_any_type(spark):
    """The reference registers dd_search as (ANY, LIST(ANY)) -> BOOLEAN
    (src/scalar_function/dd_search.cpp:31). The SQL registration here
    declares (STRING, ARRAY<STRING>), but Spark's SQL-function argument
    coercion accepts every tested type through it — numerics, dates,
    structs, nested arrays — so the ANY contract holds in practice;
    this pins that resolution behavior (a Spark upgrade tightening
    coercion would fail here, signaling the registration needs a
    different shape)."""
    from dazzleduck_sql_duckdb_spark import functions as ddfn

    ddfn.register_all(spark)
    for expr in [
        "dd_search('a', array('b'))",
        "dd_search(1, array(2, 3))",
        "dd_search(1.5, array(2.5))",
        "dd_search(CAST(1 AS BIGINT), array(CAST(2 AS BIGINT)))",
        "dd_search(named_struct('a', 1), array(named_struct('a', 2)))",
        "dd_search(array(1), array(array(2)))",
        "dd_search(DATE '2020-01-01', array(DATE '2020-01-02'))",
        "dd_search(NULL, array('x'))",
    ]:
        assert spark.sql(f"SELECT {expr} AS r").collect()[0].r is True

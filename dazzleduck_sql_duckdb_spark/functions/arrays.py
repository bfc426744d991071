"""`dd_array_contains_all` — array containment with reference NULL laws.

Semantics (parity with
/root/reference/src/scalar_function/array_contains_all.cpp):

- true iff every non-NULL needle element equals some non-NULL haystack
  element
- empty needle -> true (:88-91); empty haystack + non-empty needle ->
  false (:93-96)
- NULL haystack or NULL needle (array-level) -> NULL (:79-82)
- NULL *elements* are skipped on both sides (:102-104, 109-111)
- case-sensitive string equality

Unlike the reference (hand-written row/columnar kernels with a
selection vector, :44-270), we express the whole thing as a Catalyst
expression composition — it stays inside whole-stage codegen, costs no
Python round-trip, and distributes trivially:

    size(array_except(array_compact(needle), array_compact(haystack))) == 0

The reference's third-argument overloads:
- ``(h, n, use_columnar BOOL)`` selects row vs columnar execution
  (:274-301) — a pure execution hint; we accept and ignore it (Catalyst
  owns physical strategy).
- ``(h, n, bloom BLOB)`` short-circuits definite-misses through a bloom
  filter before exact verification (:305-426); ours probes the same
  bloom blobs via the shared layout in `bloom.py` and then exact-checks,
  preserving the no-false-negative contract.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bloom import bloom_contains_py

_EXPR = (
    "CASE WHEN {h} IS NULL OR {n} IS NULL THEN NULL "
    "ELSE size(array_except(array_compact({n}), array_compact({h}))) = 0 END"
)


def dd_array_contains_all(haystack, needle, third=None) -> Column:
    """Column API. `third` may be a bool (execution hint, ignored) or a
    BinaryType bloom-filter column (accelerated path)."""
    h = F.col(haystack) if isinstance(haystack, str) else haystack
    n = F.col(needle) if isinstance(needle, str) else needle
    if third is not None and not isinstance(third, bool):
        bloom = F.col(third) if isinstance(third, str) else third
        return _contains_all_bloom(h, n, bloom)
    return F.when(
        h.isNull() | n.isNull(), F.lit(None).cast(T.BooleanType())
    ).otherwise(F.size(F.array_except(F.array_compact(n), F.array_compact(h))) == 0)


@F.pandas_udf(T.BooleanType())
def _contains_all_bloom(h: pd.Series, n: pd.Series, bloom: pd.Series) -> pd.Series:
    """Bloom-accelerated variant: definite-miss short-circuits, hit verifies
    exactly (array_contains_all.cpp:399-417). Malformed bloom -> NULL
    (:370-385)."""
    out = []
    for hay, needle, bf in zip(h, n, bloom):
        if hay is None or needle is None:
            out.append(None)
            continue
        if bf is None:
            out.append(None)
            continue
        hay_set = {x for x in hay if x is not None}
        res: bool | None = True
        for item in needle:
            if item is None:
                continue
            probe = bloom_contains_py(bf, item)
            if probe is None:  # malformed blob
                res = None
                break
            if probe is False:  # definite miss — skip exact check
                res = False
                break
            if item not in hay_set:  # false positive — exact verify
                res = False
                break
        out.append(res)
    return pd.Series(out, dtype="object")


def register(spark) -> None:
    """SQL surface. Spark SQL functions can't overload by arity, so the
    2-arg form keeps the reference name; the hint/bloom overloads get
    suffixed names (documented deviation)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_array_contains_all("
        "h ARRAY<STRING>, n ARRAY<STRING>) RETURNS BOOLEAN RETURN "
        + _EXPR.format(h="h", n="n")
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_array_contains_all_hint("
        "h ARRAY<STRING>, n ARRAY<STRING>, use_columnar BOOLEAN) "
        "RETURNS BOOLEAN RETURN " + _EXPR.format(h="h", n="n")
    )
    spark.udf.register("dd_array_contains_all_bloom", _contains_all_bloom)

"""Bloom-filter scalar functions (`dd_bloom_filter_*` parity).

Behavioral parity with the reference implementation
(/root/reference/src/scalar_function/bloom_filter.cpp):

- blob layout: 16-byte header ``{magic 'BLOM' (0x424C4F4D), num_bits u32,
  num_hash_funcs u32, reserved u32}`` + bit array (bloom_filter.cpp:21-28,
  116-133)
- defaults: 10 bits/element (~1% FP), 3 hash functions (:14-15)
- clamps: bits/element in [1, 64] (:65-66), hashes in [1, 16] (:74-75)
- size: max(64, n * bits_per_element) bits (n = full array length incl.
  NULLs, empty array counts as 1), capped at 8,388,608 bits = 1 MiB,
  then rounded up to a whole byte (:106-113, constants :16-17)
- hash schedule: ``h_i = H(s) + i * (H(s) >> 16) + i*i; bit = h_i % num_bits``
  (:31-39). The reference's ``H`` is DuckDB's internal 64-bit ``Hash``;
  ours is the low 64 bits (little-endian) of md5 — the reference's own
  tests assert behavior (no false negatives, FP rate, NULL laws), not
  bytes, so any self-consistent 64-bit hash satisfies parity.
- NULL semantics: NULL array -> NULL blob (:98-100); NULL elements
  skipped on create (:138-140) and on contains_all probe (:294-297);
  NULL inputs to contains -> NULL (:180-184); malformed/short blob ->
  NULL (:190-206, 370-385); empty probe list -> true (:266-269).

These run as Arrow-vectorized pandas UDFs (the Spark "custom kernel"
slow path). At 100 TB scale, prefer building per-partition filters with
Spark's native ``bloom_filter_agg`` / runtime bloom-filter joins; these
UDFs exist for function-surface parity and for shipping compact
pre-filters between queries as opaque BLOB columns.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_MAGIC = 0x424C4F4D  # 'BLOM'
DEFAULT_BITS_PER_ELEMENT = 10
DEFAULT_NUM_HASHES = 3
MIN_BITS = 64
MAX_BITS = 8 * 1024 * 1024  # 1 MiB of bits
_HDR = struct.Struct("<IIII")  # magic, num_bits, num_hash_funcs, reserved


def _hash64(value: str) -> int:
    """Documented 64-bit element hash: low 8 bytes of md5, little-endian."""
    return int.from_bytes(
        hashlib.md5(value.encode("utf-8")).digest()[:8], "little"
    )


def _bit_positions(value: str, num_bits: int, num_hashes: int) -> list[int]:
    h = _hash64(value)
    step = h >> 16
    return [((h + i * step + i * i) % num_bits) for i in range(num_hashes)]


def bloom_create_py(
    elements: list | None,
    bits_per_element: int = DEFAULT_BITS_PER_ELEMENT,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> bytes | None:
    """Pure-python bloom build (one row). NULL array -> None."""
    if elements is None:
        return None
    bpe = max(1, min(64, int(bits_per_element)))
    k = max(1, min(16, int(num_hashes)))
    # sizing counts ALL elements incl. NULLs, empty array counts as 1
    # (bloom_filter.cpp:106); only non-NULLs are inserted (:138-140)
    num_elements = len(elements) if len(elements) > 0 else 1
    num_bits = max(MIN_BITS, num_elements * bpe)
    num_bits = min(num_bits, MAX_BITS)
    # round up to a whole byte; header records the rounded bit count
    # (bloom_filter.cpp:112-113) so the modulo uses every stored bit
    num_bytes = (num_bits + 7) // 8
    num_bits = num_bytes * 8
    bits = bytearray(num_bytes)
    for e in elements:
        if e is None:
            continue
        for pos in _bit_positions(str(e), num_bits, k):
            bits[pos >> 3] |= 1 << (pos & 7)
    return _HDR.pack(BLOOM_MAGIC, num_bits, k, 0) + bytes(bits)


def _parse_header(blob: bytes) -> tuple[int, int] | None:
    """Return (num_bits, num_hashes) or None if malformed."""
    if blob is None or len(blob) < _HDR.size:
        return None
    magic, num_bits, k, _ = _HDR.unpack_from(blob)
    if magic != BLOOM_MAGIC or num_bits <= 0 or k <= 0 or k > 16:
        return None
    if len(blob) < _HDR.size + (num_bits + 7) // 8:
        return None
    return num_bits, k


def bloom_contains_py(blob: bytes | None, value: str | None) -> bool | None:
    if blob is None or value is None:
        return None
    hdr = _parse_header(blob)
    if hdr is None:
        return None
    num_bits, k = hdr
    for pos in _bit_positions(str(value), num_bits, k):
        if not (blob[_HDR.size + (pos >> 3)] >> (pos & 7)) & 1:
            return False
    return True


def bloom_contains_all_py(blob: bytes | None, values: list | None) -> bool | None:
    if blob is None or values is None:
        return None
    # empty probe list -> true BEFORE blob validation: the reference
    # short-circuits first (bloom_filter.cpp:266-269), so contains_all
    # of a malformed blob and an empty list is true, not NULL
    if len(values) == 0:
        return True
    if _parse_header(blob) is None:
        return None
    for v in values:
        if v is None:  # NULL elements skipped (bloom_filter.cpp:294-297)
            continue
        r = bloom_contains_py(blob, v)
        if r is None:
            return None
        if not r:
            return False
    return True  # empty / all-NULL list -> true (:266-269)


# ---------------------------------------------------------------- pandas UDFs


@F.pandas_udf(T.BinaryType())
def _bloom_create_1(arr: pd.Series) -> pd.Series:
    return arr.map(lambda a: bloom_create_py(a) if a is not None else None)


@F.pandas_udf(T.BinaryType())
def _bloom_create_2(arr: pd.Series, bpe: pd.Series) -> pd.Series:
    return pd.Series(
        [
            bloom_create_py(a, int(b)) if a is not None else None
            for a, b in zip(arr, bpe)
        ]
    )


@F.pandas_udf(T.BinaryType())
def _bloom_create_3(arr: pd.Series, bpe: pd.Series, k: pd.Series) -> pd.Series:
    return pd.Series(
        [
            bloom_create_py(a, int(b), int(n)) if a is not None else None
            for a, b, n in zip(arr, bpe, k)
        ]
    )


@F.pandas_udf(T.BooleanType())
def _bloom_contains(blob: pd.Series, value: pd.Series) -> pd.Series:
    return pd.Series(
        [bloom_contains_py(b, v) for b, v in zip(blob, value)], dtype="object"
    )


@F.pandas_udf(T.BooleanType())
def _bloom_contains_all(blob: pd.Series, values: pd.Series) -> pd.Series:
    return pd.Series(
        [bloom_contains_all_py(b, v) for b, v in zip(blob, values)], dtype="object"
    )


def dd_bloom_filter_create(arr, bits_per_element=None, num_hashes=None):
    """Column API: build a bloom-filter BLOB from ARRAY<STRING>."""
    arr = F.col(arr) if isinstance(arr, str) else arr
    if bits_per_element is None:
        return _bloom_create_1(arr)
    bpe = F.lit(bits_per_element) if isinstance(bits_per_element, int) else bits_per_element
    if num_hashes is None:
        return _bloom_create_2(arr, bpe)
    k = F.lit(num_hashes) if isinstance(num_hashes, int) else num_hashes
    return _bloom_create_3(arr, bpe, k)


def dd_bloom_filter_contains(blob, value):
    blob = F.col(blob) if isinstance(blob, str) else blob
    value = F.lit(value) if isinstance(value, str) else value
    return _bloom_contains(blob, value)


def dd_bloom_filter_contains_all(blob, values):
    blob = F.col(blob) if isinstance(blob, str) else blob
    return _bloom_contains_all(blob, values)


def register(spark) -> None:
    """Expose the bloom functions to Spark SQL."""
    spark.udf.register("dd_bloom_filter_create", _bloom_create_1)
    spark.udf.register("dd_bloom_filter_create2", _bloom_create_2)
    spark.udf.register("dd_bloom_filter_create3", _bloom_create_3)
    spark.udf.register("dd_bloom_filter_contains", _bloom_contains)
    spark.udf.register("dd_bloom_filter_contains_all", _bloom_contains_all)

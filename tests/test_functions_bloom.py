"""Bloom-filter laws — pytest port of /root/reference/test/sql/bloom_filter.test
semantics (via SURVEY.md §2.5 F4-F6): layout, clamps, no-false-negative,
~1% FP target, NULL laws."""

from __future__ import annotations

import struct

from dazzleduck_sql_duckdb_spark.functions.bloom import (
    BLOOM_MAGIC,
    MAX_BITS,
    MIN_BITS,
    bloom_contains_all_py,
    bloom_contains_py,
    bloom_create_py,
)


def test_header_layout_and_defaults():
    bf = bloom_create_py(["a", "b", "c"])
    magic, num_bits, k, reserved = struct.unpack_from("<IIII", bf)
    assert magic == BLOOM_MAGIC
    assert num_bits == MIN_BITS  # max(64, 3*10) = 64
    assert k == 3
    assert reserved == 0
    assert len(bf) == 16 + (num_bits + 7) // 8


def test_size_scales_with_elements():
    n = 1000
    bf = bloom_create_py([f"e{i}" for i in range(n)])
    _, num_bits, _, _ = struct.unpack_from("<IIII", bf)
    assert num_bits == n * 10


def test_size_cap_1mib():
    # bits/elt clamps to 64; 200k elements * 64 > 8M bits -> capped
    bf = bloom_create_py([f"e{i}" for i in range(200_000)], 1000)
    _, num_bits, _, _ = struct.unpack_from("<IIII", bf)
    assert num_bits == MAX_BITS


def test_param_clamps():
    bf = bloom_create_py(["a"], bits_per_element=0, num_hashes=99)
    _, num_bits, k, _ = struct.unpack_from("<IIII", bf)
    assert num_bits == MIN_BITS  # bpe clamped to 1 -> max(64, 1)
    assert k == 16  # hashes clamped to [1, 16]


def test_blob_layout_matches_reference_exactly():
    """The three layout details of bloom_filter.cpp:106-113 the first
    draft got wrong: byte-rounded num_bits, sizing over ALL elements
    (NULLs included), and empty-array-counts-as-one."""
    # 25 elements * 10 bpe = 250 bits -> rounds up to 256 (32 bytes)
    bf = bloom_create_py([f"e{i}" for i in range(25)])
    _, num_bits, _, _ = struct.unpack_from("<IIII", bf)
    assert num_bits == 256
    assert len(bf) == 16 + 32
    # NULL elements count toward the size even though they are skipped
    # on insert: 24 non-null + 1 null sizes identically to 25 non-null
    bf_null = bloom_create_py([f"e{i}" for i in range(24)] + [None])
    _, n2, _, _ = struct.unpack_from("<IIII", bf_null)
    assert n2 == 256
    # empty array counts as one element -> MIN_BITS floor
    bf_empty = bloom_create_py([])
    _, n3, _, _ = struct.unpack_from("<IIII", bf_empty)
    assert n3 == MIN_BITS


def test_contains_all_empty_probe_beats_blob_validation():
    # reference order (bloom_filter.cpp:266-269): empty list -> true is
    # decided BEFORE the blob is validated
    assert bloom_contains_all_py(b"junk", []) is True
    assert bloom_contains_all_py(b"", []) is True


def test_no_false_negatives():
    elems = [f"token_{i}" for i in range(5000)]
    bf = bloom_create_py(elems)
    assert all(bloom_contains_py(bf, e) for e in elems)


def test_false_positive_rate_about_1pct():
    elems = [f"in_{i}" for i in range(10_000)]
    bf = bloom_create_py(elems)  # 10 bits/elt, 3 hashes ~ 1-2% FP
    probes = [f"out_{i}" for i in range(20_000)]
    fp = sum(1 for p in probes if bloom_contains_py(bf, p))
    assert fp / len(probes) < 0.05


def test_null_laws():
    assert bloom_create_py(None) is None
    bf = bloom_create_py(["a", None, "b"])  # NULL elements skipped
    assert bloom_contains_py(bf, "a") and bloom_contains_py(bf, "b")
    assert bloom_contains_py(None, "a") is None
    assert bloom_contains_py(bf, None) is None
    assert bloom_contains_all_py(None, ["a"]) is None
    assert bloom_contains_all_py(bf, None) is None


def test_contains_all_laws():
    bf = bloom_create_py(["a", "b", "c"])
    assert bloom_contains_all_py(bf, []) is True          # empty -> true
    assert bloom_contains_all_py(bf, [None]) is True      # all-NULL -> true
    assert bloom_contains_all_py(bf, ["a", None, "b"]) is True
    assert bloom_contains_all_py(bf, ["a", "definitely_absent_xyz"]) is False


def test_malformed_blob_is_null():
    assert bloom_contains_py(b"", "a") is None
    assert bloom_contains_py(b"\x00" * 8, "a") is None     # too short
    bad_magic = struct.pack("<IIII", 0xDEADBEEF, 64, 3, 0) + b"\x00" * 8
    assert bloom_contains_py(bad_magic, "a") is None
    truncated = struct.pack("<IIII", BLOOM_MAGIC, 1024, 3, 0) + b"\x00" * 4
    assert bloom_contains_py(truncated, "a") is None
    assert bloom_contains_all_py(b"junk", ["a"]) is None


def test_sql_surface_no_false_negative(spark, tables):
    rows = spark.sql(
        """
        SELECT dd_bloom_filter_contains(
                 dd_bloom_filter_create(tk), try_element_at(tk, 1)) AS hit
        FROM (SELECT array_distinct(
                 filter(split(lower(trim(text)), '\\\\s+'), t -> t <> '')) AS tk
              FROM documents) t
        """
    ).collect()
    assert all(r.hit is True for r in rows)

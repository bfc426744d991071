"""Property fuzz for the two dialect keystones over adversarial
strings: hash60 (the portable 60-bit md5 prefix every MinHash /
SimHash / fingerprint / shard oracle stands on) and tokens() (the
shared tokenizer every text entry stands on).

The catalog pins both on corpus text; this sweeps the space the
corpus never visits — unicode (CJK, emoji, combining marks), exotic
whitespace, control characters, quotes/backslashes, md5-prefix edge
shapes — via a shared fixture table in both engines (no SQL literal
escaping in play, which is itself part of the property: the hash must
agree on STRING VALUES, however they got there)."""

from __future__ import annotations

import random

import duckdb
import pytest

from dazzleduck_sql_duckdb_spark.plans import dialect as D

_FIXED = [
    "",
    " ",
    "\t\n  \t",
    "hello world",
    "Hello  WORLD",
    "naïve café",
    "ÅNGSTRÖM å",
    "日本語 テスト 中文",
    "🦆 duck 🔥",
    "á combining",          # a + combining acute
    " nbsp separated",  # NBSP is \s in Java AND PCRE? part of the property
    "quote ' and \" double",
    "back\\slash and % _ wildcards",
    "tab\tseparated\ttokens",
    "ends with space ",
    " starts with space",
    "ALL CAPS MIXED with lower",
    "x" * 500,
    "word " * 100,
    "line1\nline2\r\nline3",
]


def _random_strings(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    pools = [
        "abcdefghijklmnopqrstuvwxyz",
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
        " \t\n",
        "àéîõüßñçøπΩλ中文日本語한국어",
        "🦆🔥✨💯",
        "'\"\\%_.,;:!?()[]{}",
    ]
    out = []
    for _ in range(n):
        k = rng.randint(0, 60)
        out.append(
            "".join(rng.choice(rng.choice(pools)) for _ in range(k))
        )
    return out


STRINGS = _FIXED + _random_strings(180, seed=0xD1A1EC7)


@pytest.fixture(scope="module")
def hengines(spark):
    rows = [(i, s) for i, s in enumerate(STRINGS)]
    spark.createDataFrame(
        rows, schema="id BIGINT, s STRING"
    ).createOrReplaceTempView("hfuzz")
    con = duckdb.connect()
    con.execute("CREATE TABLE hfuzz (id BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO hfuzz VALUES (?, ?)", rows)
    yield spark, con
    con.close()


def test_hash60_bit_identical_on_adversarial_strings(hengines):
    spark, con = hengines
    got = {
        r["id"]: r["h"]
        for r in spark.sql(
            f"SELECT id, {D.hash60('s', D.SPARK)} AS h FROM hfuzz"
        ).collect()
    }
    want = dict(
        con.execute(
            f"SELECT id, {D.hash60('s', D.DUCK)} AS h FROM hfuzz"
        ).fetchall()
    )
    assert got == want and len(got) == len(STRINGS)


def test_hash60_salted_bit_identical(hengines):
    spark, con = hengines
    got = {
        r["id"]: r["h"]
        for r in spark.sql(
            f"SELECT id, {D.hash60_salted('s', 'id', D.SPARK)} AS h"
            " FROM hfuzz"
        ).collect()
    }
    want = dict(
        con.execute(
            f"SELECT id, {D.hash60_salted('s', 'id', D.DUCK)} AS h"
            " FROM hfuzz"
        ).fetchall()
    )
    assert got == want


def test_shingles_identical_on_adversarial_strings(hengines):
    """Shingle-set law for the MinHash/SimHash/fingerprint families:
    same char n-gram sets in both engines. This is the test that
    forced dialect.strim() — DuckDB's one-arg trim strips NBSP while
    Spark's strips only 0x20, so the bare spelling diverged on
    NBSP-edged strings exactly like tokens() did."""
    spark, con = hengines
    got = {
        r["id"]: sorted(r["g"])
        for r in spark.sql(
            f"SELECT id, {D.shingles('s', 5, D.SPARK)} AS g FROM hfuzz"
        ).collect()
    }
    want = {
        i: sorted(g)
        for i, g in con.execute(
            f"SELECT id, {D.shingles('s', 5, D.DUCK)} AS g FROM hfuzz"
        ).fetchall()
    }
    assert got == want


def test_tokens_identical_on_adversarial_strings(hengines):
    """The tokenizer law the text entries assume: same token arrays,
    for whatever '\\s' means in Java regex vs DuckDB's RE2 — if the
    engines ever disagree on a whitespace class (NBSP is the classic),
    this is the test that names the string."""
    spark, con = hengines
    got = {
        r["id"]: list(r["t"])
        for r in spark.sql(
            f"SELECT id, {D.tokens('s', D.SPARK)} AS t FROM hfuzz"
        ).collect()
    }
    want = {
        i: list(t)
        for i, t in con.execute(
            f"SELECT id, {D.tokens('s', D.DUCK)} AS t FROM hfuzz"
        ).fetchall()
    }
    assert got == want

"""`dd_search`, `dd_version`, `dd_login` — the small scalar-function parity set.

- ``dd_search(col, values) -> BOOL`` always returns true for every row
  (including NULL inputs): it is a *pushdown marker* the reference's
  remote servers rewrite into a real search
  (/root/reference/src/scalar_function/dd_search.cpp:13-21, 36-37;
  semantics tests test/sql/dd_search.test:7-51).
- ``dd_version() -> VARCHAR`` returns the engine version
  (/root/reference/src/dazzleduck_extension.cpp:22-36).
- ``dd_login(url, user, pass [, claims-json]) -> VARCHAR`` POSTs
  ``{username, password, claims}`` to ``{url}/v1/login`` and returns the
  ``accessToken`` field of the JSON response
  (/root/reference/src/scalar_function/dd_login.cpp:96-152). This is a
  driver-side credential helper; the UDF registration exists for
  signature parity only — call :func:`login` once on the driver and
  thread the token into data-source options instead of invoking it per
  row.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import functions as F

from ..version import ENGINE_VERSION

LOGIN_TIMEOUT_S = 30  # reference: 30 s connect/read/write (dd_login.cpp:126-128)


def dd_search(col, values) -> "F.Column":
    """Always-true marker (NULLs included)."""
    return F.lit(True)


def dd_version() -> "F.Column":
    return F.lit(ENGINE_VERSION)


def login(url: str, username: str, password: str, claims: str | None = None) -> str:
    """Driver-side login helper. POST {url}/v1/login, return accessToken.

    Claims: JSON object string; only string-valued fields are forwarded,
    mirroring dd_login.cpp:30-54. Raises ValueError on HTTP/parse errors
    (reference maps 4xx/5xx to typed errors, :139-149).
    """
    body: dict = {"username": username, "password": password}
    if claims:
        try:
            parsed = json.loads(claims)
        except json.JSONDecodeError as e:
            raise ValueError(f"dd_login: invalid claims JSON: {e}") from e
        if not isinstance(parsed, dict):
            raise ValueError("dd_login: claims must be a JSON object")
        body["claims"] = {k: v for k, v in parsed.items() if isinstance(v, str)}
    req = urllib.request.Request(
        url.rstrip("/") + "/v1/login",
        data=json.dumps(body).encode("utf-8"),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=LOGIN_TIMEOUT_S) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        raise ValueError(f"dd_login: HTTP {e.code} from {url}") from e
    token = payload.get("accessToken")
    if not isinstance(token, str) or not token:
        raise ValueError("dd_login: response missing accessToken")
    return token


def register(spark) -> None:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_version() "
        f"RETURNS STRING RETURN '{ENGINE_VERSION}'"
    )
    # dd_search: the reference signature is (ANY, LIST(ANY)) -> BOOLEAN
    # (dd_search.cpp:31). Spark SQL functions need declared parameter
    # types, but argument coercion into this STRING shape accepts every
    # tested type — numerics, dates, structs, nested arrays — so the
    # ANY contract holds in practice (pinned by
    # tests/test_functions_arrays.py::test_dd_search_accepts_any_type),
    # and the RETURN TRUE body folds to a literal at plan time.
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_search("
        "col STRING, vals ARRAY<STRING>) RETURNS BOOLEAN RETURN TRUE"
    )
    spark.udf.register("dd_login", login)

"""dd_* scalar-function surface (SURVEY.md §2.5 parity)."""

from .arrays import dd_array_contains_all
from .bloom import (
    dd_bloom_filter_contains,
    dd_bloom_filter_contains_all,
    dd_bloom_filter_create,
)
from .misc import dd_search, dd_version, login

from . import arrays as _arrays
from . import bloom as _bloom
from . import misc as _misc


def register_all(spark) -> None:
    """Register every dd_* function with the session (SQL + UDF surface).

    Mirrors the extension's Load() registration block
    (/root/reference/src/dazzleduck_extension.cpp:38-47).
    """
    _arrays.register(spark)
    _bloom.register(spark)
    _misc.register(spark)


__all__ = [
    "dd_array_contains_all",
    "dd_bloom_filter_create",
    "dd_bloom_filter_contains",
    "dd_bloom_filter_contains_all",
    "dd_search",
    "dd_version",
    "login",
    "register_all",
]

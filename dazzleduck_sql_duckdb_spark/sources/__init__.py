"""Remote-source surface (SURVEY.md §2.1): the Arrow-IPC-over-HTTP scan
(`dd_read_arrow`), server-side aggregation (`dd_read_arrow_agg`), split
introspection (`dd_splits`), the in-memory Arrow IPC buffer scan
(`dd_scan_arrow_ipc`), and a local wire-protocol server for tests."""

from .arrow_http import (
    ArrowHttpDataSource,
    dd_read_arrow,
    dd_read_arrow_agg,
    dd_read_arrow_narrow,
    dd_splits,
    register,
)
from .ipc import dd_scan_arrow_ipc, to_arrow_ipc

__all__ = [
    "ArrowHttpDataSource",
    "dd_read_arrow",
    "dd_read_arrow_agg",
    "dd_read_arrow_narrow",
    "dd_scan_arrow_ipc",
    "dd_splits",
    "register",
    "to_arrow_ipc",
]

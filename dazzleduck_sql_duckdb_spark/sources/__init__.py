"""Remote-source surface (SURVEY.md §2.1): the Arrow-IPC-over-HTTP scan
(`dd_read_arrow`), split introspection (`dd_splits`), and a local
wire-protocol server used for testing/demos."""

from .arrow_http import ArrowHttpDataSource, dd_read_arrow, dd_splits, register

__all__ = ["ArrowHttpDataSource", "dd_read_arrow", "dd_splits", "register"]

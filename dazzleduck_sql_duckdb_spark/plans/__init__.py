from . import dialect, queries

__all__ = ["dialect", "queries"]

"""dazzleduck_sql_duckdb_spark — PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the `dazzleduck` DuckDB extension (reference at /root/reference, see
SURVEY.md), re-expressed Spark-first: Catalyst supplies pushdown and
partial aggregation, Spark tasks supply split parallelism, pandas UDFs
supply the bespoke kernels, and a Python Data Source supplies the
remote Arrow-IPC-over-HTTP scan.
"""

from .session import get_spark, load_tables
from .version import ENGINE_VERSION

__version__ = ENGINE_VERSION
__all__ = ["get_spark", "load_tables", "ENGINE_VERSION"]

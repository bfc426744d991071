"""In-memory Arrow IPC buffer scan (`dd_scan_arrow_ipc` parity).

The reference registers raw Arrow IPC stream buffers as a scannable
table (test/python/test_arrow_ipc_scan.py:77-119: a list of in-memory
buffers becomes one table; malformed buffers raise). The Spark
rendition converts the decoded batches to a DataFrame via Arrow
transfer (`spark.createDataFrame(pyarrow.Table)` — zero-copy into the
JVM when `spark.sql.execution.arrow.pyspark.enabled` is on).

Scale contract: an in-memory buffer is by definition driver-resident,
so this is for small/medium side tables (dimension data, lookups,
results of remote calls) — exactly the reference's use case. Anything
large should arrive via `dd_read_arrow` (streamed, per-split) or
parquet, never a driver buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def dd_scan_arrow_ipc(
    spark: SparkSession, buffers: bytes | list[bytes]
) -> DataFrame:
    """Decode one or more Arrow IPC *stream* buffers into a DataFrame.

    All buffers must share one schema (they concatenate into a single
    table, like the reference's multi-buffer scan). Raises ValueError on
    an empty buffer list and pyarrow.ArrowInvalid on malformed bytes —
    the reference errors on both.
    """
    import pyarrow as pa

    if isinstance(buffers, (bytes, bytearray, memoryview)):
        buffers = [bytes(buffers)]
    if not buffers:
        raise ValueError("dd_scan_arrow_ipc: no buffers given")
    tables = []
    for buf in buffers:
        with pa.ipc.open_stream(pa.BufferReader(buf)) as reader:
            tables.append(reader.read_all())
    table = pa.concat_tables(tables)
    return spark.createDataFrame(table)


def to_arrow_ipc(df: DataFrame) -> bytes:
    """Round-trip helper: serialize a (small) DataFrame to one Arrow IPC
    stream buffer — the writer side of `dd_scan_arrow_ipc`."""
    import pyarrow as pa

    table = df.toArrow()
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as writer:
        writer.write_table(table)
    return sink.getvalue().to_pybytes()

"""Exotic-codec parquet fallback (reference parity: the second backend).

The reference ships an entire second engine — parquet-wasm — precisely
for parquet files whose codecs its primary engine can't decompress
(BROTLI et al.; /root/reference/src/parquet-wasm-backend.ts:43-49,
README.md:65-72 "Why two backends"). Spark's parquet-mr reader has the
same hole: BROTLI and LZO need codec jars this deployment doesn't carry.

Parity here, Spark-first:

- ``unsupported_codecs(path)`` inspects the footers (driver-side,
  O(footer) — no scan) and reports any column-chunk codec the JVM
  reader would fail on.
- ``read_parquet_pyarrow(spark, path)`` is the fallback scan: the
  (file, row-group) task list is parallelized across executors and each
  task decodes its row group with pyarrow (which bundles brotli),
  streaming Arrow batches through ``mapInPandas`` — row-group-granular
  parallelism, the same split unit as Spark's native reader, never a
  driver-side materialization.
- codecs NEITHER engine can decode (LZO) raise a loud
  ``NotImplementedError`` instead of an opaque executor stack trace.

``sources.registry.read`` routes parquet opens through the footer check
automatically, so `Engine.open` on a brotli file just works.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

# parquet-mr (Spark's reader) decompresses these without extra jars
_JVM_OK = {"UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD", "LZ4", "LZ4_RAW"}
# pyarrow's bundled decompressors
_PYARROW_OK = _JVM_OK | {"BROTLI"}


def _parquet_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return [path]


def unsupported_codecs(path: str) -> set[str]:
    """Column-chunk codecs in ``path`` the JVM parquet reader lacks."""
    found: set[str] = set()
    for f in _parquet_files(path):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                codec = md.row_group(rg).column(c).compression.upper()
                if codec not in _JVM_OK:
                    found.add(codec)
    return found


def read_parquet_pyarrow(spark: SparkSession, path: str) -> DataFrame:
    """Distributed parquet scan decoded by pyarrow instead of the JVM.

    One task per (file, row group); each executor opens only its own
    row group and yields Arrow-backed pandas batches. Slower than the
    native reader (Python decode) but scales the same way — use only
    when ``unsupported_codecs`` is non-empty.
    """
    from pyspark.sql.pandas.types import from_arrow_schema

    beyond = unsupported_codecs(path) - _PYARROW_OK
    if beyond:
        raise NotImplementedError(
            f"parquet codec(s) {sorted(beyond)} in {path!r}: no available "
            "decoder (JVM reader lacks them and pyarrow does too)"
        )
    files = _parquet_files(path)
    if not files:
        raise FileNotFoundError(path)
    tasks = [
        (f, rg)
        for f in files
        for rg in range(pq.ParquetFile(f).metadata.num_row_groups)
    ]
    arrow_schema = pq.ParquetFile(files[0]).schema_arrow
    schema = from_arrow_schema(arrow_schema)
    n_slices = max(1, min(len(tasks), spark.sparkContext.defaultParallelism))
    tdf = spark.createDataFrame(tasks, "__path string, __rg int").repartition(
        n_slices
    )

    def decode(batches):
        for pdf in batches:
            for p, rg in zip(pdf["__path"], pdf["__rg"]):
                tbl = pq.ParquetFile(p).read_row_group(int(rg))
                yield tbl.to_pandas(types_mapper=None)

    return tdf.mapInPandas(decode, schema)

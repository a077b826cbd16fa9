"""SQL autocomplete catalog (SURVEY.md §2 A26).

Reference: the schema is flattened to dotted paths (``a.b.c`` for nested
structs) with type docs and fed to the Ace editor's completer
(src/tabular-document-editor.ts:697-765, media/scripts/editor.js:32-61).
"""

from __future__ import annotations

from pyspark.sql import types as T

from vscode_parquet_visualizer_spark.functions.schema_format import (
    duckdb_type_string,
)


def completions(schema: T.StructType, prefix: str = "") -> list[dict[str, str]]:
    """Flatten a schema to [{name, type}] with dotted paths for nesting."""
    out: list[dict[str, str]] = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        out.append({"name": path, "type": duckdb_type_string(f.dataType)})
        if isinstance(f.dataType, T.StructType):
            out.extend(completions(f.dataType, prefix=path + "."))
    return out

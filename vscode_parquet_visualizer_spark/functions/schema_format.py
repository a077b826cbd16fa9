"""Schema introspection rows + Arrow-style type strings (SURVEY.md §2 A10).

Reference: ``DESCRIBE SELECT * FROM query_result`` returns rows
``{column_name, column_type, null, key, default, extra}``; each row is
enriched with an Arrow-style type produced by a recursive string parser
(src/duckdb-backend.ts:101-124, src/duckdb-schema-converter.ts:7-354).

Spark-first: ``df.schema`` is already a typed tree — no string parsing
needed. We walk the StructType directly and emit (a) a DuckDB-flavored
uppercase type string (what DESCRIBE shows) and (b) the reference's
Arrow-style display form, including its quirks:
- struct → ``{field: type, ...}`` object; a single-field struct unwraps to
  the lone field's type (converter :168-181).
- list/array → ``[elementType]`` (fixed-size arrays lose their length,
  matching Spark's type system).
- map → ``"<K, V>"`` string (converter :311-320).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

# Spark simpleString → DuckDB DESCRIBE-style name
_DUCK_NAMES = {
    "boolean": "BOOLEAN",
    "tinyint": "TINYINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "binary": "BLOB",
    "date": "DATE",
    "time": "TIME",  # Spark ≥4.1 TimeType closes the SURVEY §1.3 TIME gap
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "void": "NULL",
}

# Arrow display names (what the reference's converter emits)
_ARROW_NAMES = {
    "boolean": "Bool",
    "tinyint": "Int8",
    "smallint": "Int16",
    "int": "Int32",
    "integer": "Int32",
    "bigint": "Int64",
    "float": "Float32",
    "double": "Float64",
    "string": "String",
    "binary": "Binary",
    "date": "Date32",
    "time": "Time64",
    "timestamp": "Timestamp",
    "timestamp_ntz": "Timestamp",
    "void": "Null",
}


def duckdb_type_string(dtype: T.DataType) -> str:
    """Spark type → DuckDB DESCRIBE-style type string."""
    if isinstance(dtype, T.DecimalType):
        return f"DECIMAL({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.TimeType):
        return "TIME"
    if isinstance(dtype, T.ArrayType):
        return f"{duckdb_type_string(dtype.elementType)}[]"
    if isinstance(dtype, T.MapType):
        return (
            f"MAP({duckdb_type_string(dtype.keyType)}, "
            f"{duckdb_type_string(dtype.valueType)})"
        )
    if isinstance(dtype, T.StructType):
        if is_union_struct(dtype):
            inner = ", ".join(
                f"{f.name} {duckdb_type_string(f.dataType)}"
                for f in dtype.fields[1:]
            )
            return f"UNION({inner})"
        inner = ", ".join(
            f"{f.name} {duckdb_type_string(f.dataType)}" for f in dtype.fields
        )
        return f"STRUCT({inner})"
    if isinstance(dtype, (T.DayTimeIntervalType, T.YearMonthIntervalType)):
        return "INTERVAL"
    return _DUCK_NAMES.get(dtype.simpleString(), dtype.simpleString().upper())


def is_union_struct(dtype: T.DataType) -> bool:
    """DuckDB writes UNION columns to parquet as a struct whose first
    field is an UNNAMED small-int tag followed by one field per member
    (SURVEY §1.3). Spark reads that struct verbatim (empty field name,
    ShortType tag); detect the shape so the schema tab can render the
    logical UNION(...) type instead of the physical encoding."""
    return (
        isinstance(dtype, T.StructType)
        and len(dtype.fields) >= 2
        and dtype.fields[0].name == ""
        and isinstance(
            dtype.fields[0].dataType,
            (T.ByteType, T.ShortType, T.IntegerType),
        )
    )


def arrow_type(dtype: T.DataType) -> Any:
    """Spark type → the reference converter's Arrow-style display form."""
    if isinstance(dtype, T.DecimalType):
        return f"Decimal128({dtype.precision}, {dtype.scale})"
    if isinstance(dtype, T.TimeType):
        return "Time64"
    if isinstance(dtype, T.ArrayType):
        return [arrow_type(dtype.elementType)]
    if isinstance(dtype, T.MapType):
        return f"<{arrow_type(dtype.keyType)}, {arrow_type(dtype.valueType)}>"
    if isinstance(dtype, T.StructType):
        if is_union_struct(dtype):
            return f"DenseUnion<{', '.join(str(arrow_type(f.dataType)) for f in dtype.fields[1:])}>"
        # single-field struct unwraps to the field's type
        # (reference src/duckdb-schema-converter.ts:168-181)
        if len(dtype.fields) == 1:
            return arrow_type(dtype.fields[0].dataType)
        return {f.name: arrow_type(f.dataType) for f in dtype.fields}
    if isinstance(dtype, (T.DayTimeIntervalType, T.YearMonthIntervalType)):
        return "Interval"
    return _ARROW_NAMES.get(dtype.simpleString(), dtype.simpleString())


# DuckDB-type → Excel mso-number-format class used by the reference's
# copy-to-clipboard HTML (media/scripts/table-wrapper.js:58-136 — A24):
# the presentation-side mapping is a pure type→format table.
_MSO_FORMATS = [
    (("TINYINT", "SMALLINT", "INTEGER", "BIGINT"), "0"),
    (("FLOAT", "DOUBLE", "DECIMAL"), "0\\.00"),
    (("DATE",), "yyyy\\-mm\\-dd"),
    (("TIMESTAMP", "TIME"), "yyyy\\-mm\\-dd\\ hh\\:mm\\:ss"),
]


def mso_number_format(type_string: str) -> str:
    """Excel paste format class for a column type (default: text)."""
    upper = type_string.upper()
    for prefixes, fmt in _MSO_FORMATS:
        if any(upper.startswith(p) for p in prefixes):
            return fmt
    return "\\@"  # text


def search_schema_rows(
    rows: list[dict[str, Any]], term: str
) -> list[dict[str, Any]]:
    """Driver-side search over already-collected schema rows — the
    reference's client-side (in-browser) search path for small relations
    (media/scripts/search-box.js:76-104 — A23)."""
    if term == "":
        return rows
    needle = term.lower()
    return [
        r
        for r in rows
        if any(needle in str(v).lower() for v in r.values() if v is not None)
    ]


def schema_rows(schema: T.StructType) -> list[dict[str, Any]]:
    """DESCRIBE-shaped rows for a DataFrame schema (the reference's schema
    tab contract: column_name, column_type, null, key, default, extra)."""
    return [
        {
            "column_name": f.name,
            "column_type": duckdb_type_string(f.dataType),
            "arrow_column_type": arrow_type(f.dataType),
            "null": "YES" if f.nullable else "NO",
            "key": None,
            "default": None,
            "extra": None,
        }
        for f in schema.fields
    ]

"""JSON-safe serialization rules (reference src/backend.ts:90-170,
src/util.ts:60-71 — SURVEY.md §1.3)."""

import datetime as dt
import json
from decimal import Decimal

from pyspark.sql import Row

from vscode_parquet_visualizer_spark.functions.serialization import (
    safe_column_name,
    serialize_rows,
    serialize_value,
)


def test_big_int_to_string():
    assert serialize_value(2**60) == str(2**60)
    assert serialize_value(42) == 42
    assert serialize_value(-(2**60)) == str(-(2**60))


def test_float_nan_inf():
    assert serialize_value(float("nan")) is None
    assert serialize_value(float("inf")) is None
    assert serialize_value(1.5) == 1.5


def test_decimal_to_string():
    assert serialize_value(Decimal("12.345")) == "12.345"


def test_dates():
    assert serialize_value(dt.date(2024, 1, 2)) == "2024-01-02"
    assert (
        serialize_value(dt.datetime(2024, 1, 2, 3, 4, 5))
        == "2024-01-02 03:04:05"
    )


def test_bytes_to_int_list():
    assert serialize_value(b"\x01\x02\xff") == [1, 2, 255]


def test_nested_to_json_string():
    out = serialize_value({"a": 1, "b": [1, 2]})
    assert json.loads(out) == {"a": 1, "b": [1, 2]}
    out2 = serialize_value([{"x": dt.date(2024, 1, 1)}])
    assert json.loads(out2) == [{"x": "2024-01-01"}]


def test_row_nested():
    out = serialize_value(Row(a=1, b=Row(c=2)))
    assert json.loads(out) == {"a": 1, "b": {"c": 2}}


def test_safe_column_name():
    assert safe_column_name("a.b.c") == "a_b_c"
    assert safe_column_name("plain") == "plain"


def test_serialize_rows_renames_dotted():
    rows = serialize_rows([Row(**{"a.b": 1, "c": None})])
    assert rows == [{"a_b": 1, "c": None}]

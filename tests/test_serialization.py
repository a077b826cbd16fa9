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


def test_datetime_format_settings():
    import datetime as dt

    from vscode_parquet_visualizer_spark.functions.settings import (
        RFC2822,
        Settings,
        format_datetime,
    )

    v = dt.datetime(2024, 3, 5, 14, 30, 45)
    assert format_datetime(v) == "2024-03-05 14:30:45"
    assert (
        format_datetime(v, Settings(datetime_format=RFC2822))
        == "Tue, 05 Mar 2024 14:30:45 +0000"
    )
    assert (
        format_datetime(v, Settings(datetime_format="YYYY/MM/DD HH:mm"))
        == "2024/03/05 14:30"
    )


def test_settings_flow_through_page(spark):
    import datetime as dt

    from vscode_parquet_visualizer_spark.engine import Engine
    from vscode_parquet_visualizer_spark.functions.settings import Settings

    eng = Engine(spark=spark, settings=Settings(datetime_format="DD.MM.YYYY HH:mm:ss"))
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 5, 14, 30, 45))], ["id", "ts"]
    )
    import tempfile, os
    p = os.path.join(tempfile.mkdtemp(), "t.parquet")
    df.write.mode("overwrite").parquet(p)
    d = eng.open(p)
    rows = d.query("SELECT * FROM data").page(1, 1)
    assert rows[0]["ts"] == "05.03.2024 14:30:45"

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
        == "2024-01-02T03:04:05.000Z"  # reference toISOString render (r14)
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
    # r14: exact reference modes (src/backend.ts:144-155) — ISO8601 is
    # Date.toISOString() (T separator, 3 fraction digits, Z), RFC2822
    # is Date.toUTCString() (GMT suffix)
    assert format_datetime(v) == "2024-03-05T14:30:45.000Z"
    assert (
        format_datetime(v, Settings(datetime_format=RFC2822))
        == "Tue, 05 Mar 2024 14:30:45 GMT"
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


class TestRound14TimestamptzRender:
    """r14 verdict item 4: TIMESTAMPTZ render parity. The reference
    receives tz-aware timestamps as JS Date instants and renders them
    through the same three modes as naive timestamps
    (src/backend.ts:131-156); Spark has no tz-aware CELL type (its
    TIMESTAMP is an instant, collected session-naive with the session
    pinned to UTC), so parity = the serializer renders a tz-aware value
    and its session-naive Spark equivalent to the SAME string."""

    def test_aware_and_naive_render_identically(self):
        import datetime as dt

        from vscode_parquet_visualizer_spark.functions.settings import (
            RFC2822,
            Settings,
            format_datetime,
        )

        aware = dt.datetime(
            2021, 6, 14, 7, 0, 0,
            tzinfo=dt.timezone(dt.timedelta(hours=2)),
        )
        naive_utc = dt.datetime(2021, 6, 14, 5, 0, 0)  # same instant
        for s in (
            None,
            Settings(datetime_format=RFC2822),
            Settings(datetime_format="YYYY-MM-DD HH:mm:ss"),
        ):
            assert format_datetime(aware, s) == format_datetime(
                naive_utc, s
            )

    def test_duckdb_timestamptz_matches_spark_render(self, spark):
        # DuckDB returns a tz-aware value for TIMESTAMPTZ; Spark
        # returns the session-naive instant for the same SQL — both
        # must serialize to the reference's ISO8601 render
        import duckdb

        from vscode_parquet_visualizer_spark.functions.serialization import (
            serialize_value,
        )
        from vscode_parquet_visualizer_spark.plans.sql_gateway import (
            run_sql,
        )

        sql = "SELECT TIMESTAMPTZ '2021-06-14 07:00:00+02' AS t"
        duck_v = duckdb.connect().execute(sql).fetchone()[0]
        spark_v = run_sql(spark, sql).collect()[0][0]
        assert duck_v.tzinfo is not None and spark_v.tzinfo is None
        assert (
            serialize_value(duck_v)
            == serialize_value(spark_v)
            == "2021-06-14T05:00:00.000Z"
        )

    def test_iso8601_mode_ignores_utc_flag(self):
        # reference: the ISO8601 branch calls toISOString() regardless
        # of the UTC/local setting
        import datetime as dt

        from vscode_parquet_visualizer_spark.functions.settings import (
            Settings,
            format_datetime,
        )

        v = dt.datetime(2024, 3, 5, 14, 30, 45, 123456)
        assert (
            format_datetime(v, Settings(utc=False))
            == "2024-03-05T14:30:45.123Z"
        )

    def test_date_render_modes(self):
        import datetime as dt

        from vscode_parquet_visualizer_spark.functions.settings import (
            RFC2822,
            Settings,
            format_date,
        )

        d = dt.date(2024, 3, 5)
        assert format_date(d) == "2024-03-05"
        assert (
            format_date(d, Settings(datetime_format=RFC2822))
            == "Tue, 05 Mar 2024"
        )
        # custom pattern: reference falls back to JS toDateString()
        assert (
            format_date(d, Settings(datetime_format="YYYY/MM/DD"))
            == "Tue Mar 05 2024"
        )

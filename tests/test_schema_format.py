"""Schema formatter incl. nested types and the single-field-struct unwrap
quirk (reference src/duckdb-schema-converter.ts:168-181 — SURVEY.md §1.3)."""

from pyspark.sql import types as T

from vscode_parquet_visualizer_spark.functions.completions import completions
from vscode_parquet_visualizer_spark.functions.schema_format import (
    arrow_type,
    duckdb_type_string,
    schema_rows,
)

NESTED = T.StructType(
    [
        T.StructField("i", T.IntegerType(), False),
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DecimalType(18, 3)),
        T.StructField("arr", T.ArrayType(T.DoubleType())),
        T.StructField("m", T.MapType(T.StringType(), T.LongType())),
        T.StructField(
            "st",
            T.StructType(
                [
                    T.StructField("x", T.IntegerType()),
                    T.StructField("y", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        T.StructField(
            "single", T.StructType([T.StructField("only", T.BooleanType())])
        ),
    ]
)


def test_duckdb_type_strings():
    by_name = {f.name: duckdb_type_string(f.dataType) for f in NESTED.fields}
    assert by_name["i"] == "INTEGER"
    assert by_name["s"] == "VARCHAR"
    assert by_name["d"] == "DECIMAL(18,3)"
    assert by_name["arr"] == "DOUBLE[]"
    assert by_name["m"] == "MAP(VARCHAR, BIGINT)"
    assert by_name["st"] == "STRUCT(x INTEGER, y VARCHAR[])"


def test_arrow_types_nested():
    assert arrow_type(NESTED["arr"].dataType) == ["Float64"]
    assert arrow_type(NESTED["m"].dataType) == "<String, Int64>"
    assert arrow_type(NESTED["st"].dataType) == {"x": "Int32", "y": ["String"]}
    assert arrow_type(NESTED["d"].dataType) == "Decimal128(18, 3)"


def test_single_field_struct_unwraps():
    # reference quirk: STRUCT with one field displays as the field's type
    assert arrow_type(NESTED["single"].dataType) == "Bool"


def test_schema_rows_shape():
    rows = schema_rows(NESTED)
    assert rows[0] == {
        "column_name": "i",
        "column_type": "INTEGER",
        "arrow_column_type": "Int32",
        "null": "NO",
        "key": None,
        "default": None,
        "extra": None,
    }


def test_completions_flatten_nested():
    comp = completions(NESTED)
    names = [c["name"] for c in comp]
    assert "st" in names and "st.x" in names and "st.y" in names
    assert "single.only" in names


def test_mso_number_format():
    from vscode_parquet_visualizer_spark.functions.schema_format import (
        mso_number_format,
    )

    assert mso_number_format("BIGINT") == "0"
    assert mso_number_format("DOUBLE") == "0\\.00"
    assert mso_number_format("DECIMAL(18,3)") == "0\\.00"
    assert mso_number_format("VARCHAR") == "\\@"
    assert mso_number_format("TIMESTAMP") == "yyyy\\-mm\\-dd\\ hh\\:mm\\:ss"


def test_search_schema_rows():
    from vscode_parquet_visualizer_spark.functions.schema_format import (
        search_schema_rows,
        schema_rows,
    )

    rows = schema_rows(NESTED)
    assert search_schema_rows(rows, "") == rows
    hits = search_schema_rows(rows, "decimal")
    assert [r["column_name"] for r in hits] == ["d"]
    assert search_schema_rows(rows, "zzz") == []


def test_union_type_rendering(spark, tmp_path):
    """DuckDB UNION columns (SURVEY §1.3) arrive as a struct with an
    unnamed small-int tag; the schema tab renders the logical UNION(...)
    and pages show the active member's value, not the raw struct."""
    import duckdb

    from vscode_parquet_visualizer_spark.engine import Engine

    p = str(tmp_path / "u.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u AS "
        "SELECT 1 AS id, union_value(num := 2)::UNION(num INTEGER, str VARCHAR) AS v "
        "UNION ALL SELECT 2, union_value(str := 'x')::UNION(num INTEGER, str VARCHAR)"
    )
    con.execute(f"COPY u TO '{p}' (FORMAT parquet)")
    con.close()

    eng = Engine(spark=spark)
    ds = eng.open(p)
    types = {r["column_name"]: r["column_type"] for r in ds.schema()}
    assert types["v"] == "UNION(num INTEGER, str VARCHAR)"
    rows = sorted(ds.page(1, 10), key=lambda r: r["id"])
    assert rows[0]["v"] == 2
    assert rows[1]["v"] == "x"

"""Type-coverage fixtures and tests (FIXTURES.md §2): every scalar and
nested type the reference's schema converter + serializer handle, plus the
empty/one-row pagination edge cases and CSV-inference parity."""

import json
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vscode_parquet_visualizer_spark.engine import Engine
from vscode_parquet_visualizer_spark.operators.pagination import PAGE_ALL


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("typefixtures")

    # --- types_scalar.parquet (FIXTURES.md §2.1) ---
    n = 8
    scalar = pa.table(
        {
            "c_bool": pa.array([True, False, None, True, False, True, None, False]),
            "c_i8": pa.array([1, -2, None, 127, -128, 0, 5, -5], type=pa.int8()),
            "c_i16": pa.array([1000, -2000, None, 32767, -32768, 0, 7, -7], type=pa.int16()),
            "c_i32": pa.array([10**6, -(10**6), None, 2**31 - 1, -(2**31), 0, 9, -9], type=pa.int32()),
            "c_i64": pa.array(
                [2**60, -(2**60), None, 2**53 - 1, 42, 0, 2**53 + 1, -1],
                type=pa.int64(),
            ),
            "c_f64": pa.array(
                [1.5, float("nan"), None, float("inf"), float("-inf"), 0.0, -2.25, 1e300]
            ),
            "c_dec": pa.array(
                [None, 1, 2, 3, 4, 5, 6, 7], type=pa.decimal128(18, 3)
            ),
            "c_str": pa.array(
                ["plain", "100% sure", "under_score", 'quo"te', "<b>html</b>", None, "", "tail"]
            ),
            "c_blob": pa.array(
                [b"\x01\x02", b"", None, b"\xff", b"abc", b"\x00", b"xy", b"z"]
            ),
            "c_date": pa.array(
                [None] + [18000 + i for i in range(n - 1)], type=pa.date32()
            ),
            "c_ts": pa.array(
                [None] + [1700000000_000_000 + i * 10**6 for i in range(n - 1)],
                type=pa.timestamp("us"),
            ),
            "c_json": pa.array(
                ['{"a": 1}', '{"b": [1,2]}', None, "{}", '{"n": null}', '{"s": "x"}', "[]", '{"f": 1.5}']
            ),
            "col.with.dots": pa.array(list(range(n))),
            "col with space": pa.array([f"v{i}" for i in range(n)]),
        }
    )
    pq.write_table(scalar, str(d / "types_scalar.parquet"))

    # --- types_nested.parquet (§2.2) ---
    nested = pa.table(
        {
            "s_flat": pa.array(
                [{"a": 1, "b": "x"}, {"a": 2, "b": None}, None],
                type=pa.struct([("a", pa.int32()), ("b", pa.string())]),
            ),
            "s_deep": pa.array(
                [
                    {"x": {"y": {"z": 1}}, "arr": ["p", "q"]},
                    {"x": {"y": {"z": 2}}, "arr": []},
                    None,
                ],
                type=pa.struct(
                    [
                        ("x", pa.struct([("y", pa.struct([("z", pa.int32())]))])),
                        ("arr", pa.list_(pa.string())),
                    ]
                ),
            ),
            "l_int": pa.array([[1, 2], [], None], type=pa.list_(pa.int32())),
            "l_struct": pa.array(
                [[{"k": "a", "v": 1.5}], [], None],
                type=pa.list_(pa.struct([("k", pa.string()), ("v", pa.float64())])),
            ),
            "m_str_int": pa.array(
                [[("k1", 1), ("k2", 2)], [], None],
                type=pa.map_(pa.string(), pa.int32()),
            ),
            "fixed3": pa.array(
                [[1, 2, 3], [4, 5, 6], None], type=pa.list_(pa.int32(), 3)
            ),
        }
    )
    pq.write_table(nested, str(d / "types_nested.parquet"))

    # --- wide.csv (§2.3): quoted commas + embedded newline ---
    (d / "wide.csv").write_text(
        "id,name,amount,flag,when,day\n"
        '1,"Smith, John",1.5,true,2024-01-02 03:04:05,2024-01-02\n'
        '2,"multi\nline",2.5,false,2024-02-02 03:04:05,2024-02-02\n'
        "3,plain,3.5,true,2024-03-02 03:04:05,2024-03-02\n"
    )

    # --- empty.parquet / one_row.parquet (§2.5) ---
    empty = scalar.slice(0, 0)
    pq.write_table(empty, str(d / "empty.parquet"))
    pq.write_table(scalar.slice(0, 1), str(d / "one_row.parquet"))
    return d


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark=spark)


def test_scalar_serialization_rules(engine, fixture_dir):
    ds = engine.open(f"{fixture_dir}/types_scalar.parquet")
    rows = ds.query("SELECT * FROM data").page(1, PAGE_ALL if False else 8)
    r0, r1 = rows[0], rows[1]
    # BigInt beyond 2^53 → string; small int stays numeric (backend.ts:165)
    assert r0["c_i64"] == str(2**60)
    assert rows[3]["c_i64"] == 2**53 - 1
    # NaN/Inf → None (JSON-safe)
    assert r1["c_f64"] is None and rows[3]["c_f64"] is None
    # Decimal → exact string
    assert r1["c_dec"] == "1.000"
    # blob → int list (backend.ts:128)
    assert r0["c_blob"] == [1, 2]
    # date/timestamp → formatted strings; date is date-only (backend.ts:135)
    assert rows[1]["c_date"].count("-") == 2 and ":" not in rows[1]["c_date"]
    assert ":" in rows[1]["c_ts"]
    # dotted column renamed (util.ts:60-71)
    assert "col_with_dots" in r0 and "col.with.dots" not in r0


def test_search_percent_literal(engine, fixture_dir):
    """'%' in the search term is literal for us (the reference's raw LIKE
    interpolation would wildcard it — SURVEY §2 A9 note)."""
    ds = engine.open(f"{fixture_dir}/types_scalar.parquet")
    rs = ds.query("SELECT c_str FROM data")
    assert rs.search("100% sure") == 1
    assert rs.search("100%") == 1  # literal prefix, not match-all
    rs.search("")
    assert rs.search("under_score") == 1  # '_' literal too


def test_nested_schema_and_serialization(engine, fixture_dir):
    ds = engine.open(f"{fixture_dir}/types_nested.parquet")
    types = {r["column_name"]: r for r in ds.schema()}
    assert types["s_flat"]["column_type"] == "STRUCT(a INTEGER, b VARCHAR)"
    assert types["l_int"]["column_type"] == "INTEGER[]"
    assert types["m_str_int"]["column_type"] == "MAP(VARCHAR, INTEGER)"
    # single-field struct chain unwraps in the arrow-style rendering
    assert types["s_deep"]["arrow_column_type"]["x"] == "Int32"
    # nested cells serialize to JSON strings (backend.ts:112-121)
    rows = ds.query("SELECT * FROM data").page(1, 3)
    assert json.loads(rows[0]["s_flat"]) == {"a": 1, "b": "x"}
    assert json.loads(rows[0]["l_struct"]) == [{"k": "a", "v": 1.5}]
    assert json.loads(rows[0]["m_str_int"]) == {"k1": 1, "k2": 2}
    assert rows[2]["s_flat"] is None
    # fixed-size arrays read as plain lists (length dropped — §1.3)
    assert json.loads(rows[0]["fixed3"]) == [1, 2, 3]


def test_csv_inference_by_value(engine, fixture_dir):
    ds = engine.open(f"{fixture_dir}/wide.csv")
    assert ds.row_count() == 3
    rows = ds.query(
        "SELECT id, name, amount, flag FROM data ORDER BY id"
    ).page(1, 3)
    assert rows[0]["name"] == "Smith, John"      # quoted comma survives
    assert rows[0]["amount"] == 1.5 and rows[0]["flag"] is True


def test_empty_parquet(engine, fixture_dir):
    ds = engine.open(f"{fixture_dir}/empty.parquet")
    assert ds.row_count() == 0
    rs = ds.query("SELECT * FROM data")
    assert rs.row_count == 0
    pager = rs.paginator(20)
    assert pager.total_pages == 1  # reference renders a single empty page
    assert rs.page(1, 20) == []
    with pytest.raises(IndexError):
        rs.page_df(2, 20)


def test_one_row_parquet(engine, fixture_dir):
    ds = engine.open(f"{fixture_dir}/one_row.parquet")
    rs = ds.query("SELECT c_i64 FROM data")
    assert rs.row_count == 1
    assert rs.paginator(20).total_pages == 1
    assert len(rs.page(1, 20)) == 1


def test_unsigned_widening(engine, tmp_path):
    """SURVEY §1.3: unsigned parquet types widen u8→SMALLINT, u16→INT,
    u32→BIGINT, u64→DECIMAL(20,0) (Spark's native mapping matches the
    prescription); u64 max serializes losslessly as a string."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "u8": pa.array([0, 255, None], type=pa.uint8()),
            "u16": pa.array([0, 65535, None], type=pa.uint16()),
            "u32": pa.array([0, 2**32 - 1, None], type=pa.uint32()),
            "u64": pa.array([0, 2**64 - 1, None], type=pa.uint64()),
        }
    )
    p = str(tmp_path / "u.parquet")
    pq.write_table(t, p)
    ds = engine.open(p)
    types = {r["column_name"]: r["column_type"] for r in ds.schema()}
    assert types == {
        "u8": "SMALLINT",
        "u16": "INTEGER",
        "u32": "BIGINT",
        "u64": "DECIMAL(20,0)",
    }
    rows = ds.query("SELECT * FROM data").page(1, 3)
    assert rows[1]["u64"] == str(2**64 - 1)  # exact, stringified decimal
    assert rows[1]["u32"] == 2**32 - 1

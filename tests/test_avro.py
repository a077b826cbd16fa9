"""Avro source (SURVEY.md §2 A3): pure-Python container-file codec and the
distributed fallback reader (sources/avro.py). The spark-avro jar is absent
in this container, so registry.read('avro') exercises the fallback path —
the same route a user hits opening a .avro file."""

import datetime as dt
import decimal

import pytest

from vscode_parquet_visualizer_spark.sources.avro import (
    decode_file,
    file_spark_schema,
    parse_header,
    write_avro,
)
from vscode_parquet_visualizer_spark.sources import registry

SCHEMA = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {
            "name": "ts",
            "type": {"type": "long", "logicalType": "timestamp-micros"},
        },
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "Inner",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
        {
            "name": "amount",
            "type": {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": 10,
                "scale": 2,
            },
        },
    ],
}


def _rows(n=50):
    out = []
    for i in range(n):
        out.append(
            {
                "id": i,
                "name": None if i % 7 == 0 else f"name-{i}",
                "score": i * 1.5,
                "flag": i % 2 == 0,
                "day": dt.date(2024, 1, 1) + dt.timedelta(days=i),
                "ts": dt.datetime(2024, 1, 1, 12, 0, 0)
                + dt.timedelta(seconds=i),
                "tags": [f"t{i}", "common"] if i % 3 else [],
                "attrs": {"k": i},
                "nested": {"x": i * 2},
                "amount": (123456 + i),  # unscaled int for decimal(10,2)
            }
        )
    return out


def _encode_row(row):
    """dict → field-ordered tuple with decimal as unscaled bytes."""
    amount = int(row["amount"]).to_bytes(8, "big", signed=True)
    return (
        row["id"], row["name"], row["score"], row["flag"], row["day"],
        row["ts"], row["tags"], row["attrs"], (row["nested"]["x"],), amount,
    )


@pytest.fixture(scope="module", params=["null", "deflate"])
def avro_file(request, tmp_path_factory):
    p = str(
        tmp_path_factory.mktemp("avro") / f"events_{request.param}.avro"
    )
    write_avro(
        p, SCHEMA, [_encode_row(r) for r in _rows()],
        codec=request.param, block_rows=17,  # force multiple blocks
    )
    return p


def test_header_and_local_decode(avro_file):
    data = open(avro_file, "rb").read()
    schema, codec, sync, _ = parse_header(data)
    assert schema["name"] == "Event" and len(sync) == 16
    _, rows = decode_file(data)
    assert len(rows) == 50
    want = _rows()
    # spot-check typed values survive the round trip
    assert rows[1][0] == 1 and rows[1][1] == "name-1"
    assert rows[0][1] is None
    assert rows[3][4] == want[3]["day"]
    assert rows[3][5] == want[3]["ts"]
    assert rows[4][6] == want[4]["tags"]
    assert rows[4][8] == {"x": 8}
    assert rows[2][9] == decimal.Decimal("1234.58")


def test_spark_schema_mapping():
    s = file_spark_schema(SCHEMA)
    kinds = {f.name: f.dataType.simpleString() for f in s.fields}
    assert kinds["id"] == "bigint"
    assert kinds["name"] == "string" and s["name"].nullable
    assert kinds["day"] == "date"
    assert kinds["ts"] == "timestamp"
    assert kinds["tags"] == "array<string>"
    assert kinds["attrs"] == "map<string,bigint>"
    assert kinds["nested"] == "struct<x:int>"
    assert kinds["amount"] == "decimal(10,2)"


def test_registry_reads_avro_distributed(spark, avro_file):
    df = registry.read(spark, avro_file, "avro")
    assert df.count() == 50
    got = {r["id"]: r for r in df.collect()}
    assert got[1]["name"] == "name-1" and got[0]["name"] is None
    assert got[4]["nested"]["x"] == 8
    assert got[2]["amount"] == decimal.Decimal("1234.58")
    assert got[3]["day"] == dt.date(2024, 1, 4)


def test_registry_reads_avro_directory(spark, tmp_path):
    d = tmp_path / "avrodir"
    d.mkdir()
    rows = [_encode_row(r) for r in _rows(20)]
    write_avro(str(d / "part1.avro"), SCHEMA, rows[:10])
    write_avro(str(d / "part2.avro"), SCHEMA, rows[10:])
    df = registry.read(spark, str(d), "avro")
    assert df.count() == 20
    # two files → two input partitions → real file-level parallelism
    assert df.rdd.getNumPartitions() >= 1


def test_engine_opens_avro(spark, avro_file):
    from vscode_parquet_visualizer_spark.engine import Engine

    eng = Engine(spark=spark)
    ds = eng.open(avro_file)
    assert ds.format == "avro"
    rs = ds.query("SELECT id, name FROM data WHERE id < 5")
    assert rs.row_count == 5


def test_avro_write_fallback_round_trip(spark, tmp_path):
    """Write with the pure-Python container writer, re-read with the
    pure-Python fallback reader — the full type palette survives
    (round-4: closes the read-only asymmetry of the Avro fallback)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from vscode_parquet_visualizer_spark.sources.avro import (
        read_avro_fallback,
        write_avro_fallback,
    )

    df = spark.sql(
        """
        SELECT id,
               CAST(id AS INT) AS i32,
               CAST(id * 1.5 AS DOUBLE) AS d,
               CAST(id AS STRING) AS s,
               id % 2 = 0 AS b,
               CASE WHEN id = 2 THEN NULL ELSE id * 10 END AS maybe_null,
               DATE'2024-03-05' AS dte,
               TIMESTAMP'2024-03-05 12:30:45.123456' AS ts,
               array(id, id + 1) AS arr,
               named_struct('x', id, 'y', CAST(id AS STRING)) AS st,
               map('k', id) AS m,
               CAST(unhex('DEADBEEF') AS BINARY) AS bin
        FROM range(4)
        """
    )
    p = str(tmp_path / "out.avro")
    write_avro_fallback(df, p, codec="deflate")
    back = read_avro_fallback(spark, p)
    assert back.count() == 4
    rows = {r["id"]: r for r in back.collect()}
    assert rows[1]["i32"] == 1 and rows[1]["d"] == 1.5 and rows[1]["s"] == "1"
    assert rows[2]["maybe_null"] is None and rows[3]["maybe_null"] == 30
    assert rows[0]["dte"] == dt.date(2024, 3, 5)
    assert rows[0]["ts"] == dt.datetime(2024, 3, 5, 12, 30, 45, 123456)
    assert rows[1]["arr"] == [1, 2]
    assert rows[1]["st"]["x"] == 1 and rows[1]["st"]["y"] == "1"
    assert rows[1]["m"] == {"k": 1}
    assert bytes(rows[0]["bin"]) == b"\xde\xad\xbe\xef"
    # null codec too
    p2 = str(tmp_path / "out2.avro")
    write_avro_fallback(df.select("id", "s"), p2, codec="null")
    assert read_avro_fallback(spark, p2).count() == 4


def test_avro_export_dispatch(spark, tmp_path):
    """engine export('avro') routes through the exporter registry."""
    from vscode_parquet_visualizer_spark.operators.export import export
    from vscode_parquet_visualizer_spark.sources.avro import (
        read_avro_fallback,
    )

    df = spark.range(5).withColumnRenamed("id", "v")
    p = str(tmp_path / "e.avro")
    export(df, p, "avro")
    back = read_avro_fallback(spark, p)
    assert sorted(r["v"] for r in back.collect()) == [0, 1, 2, 3, 4]


def test_multi_branch_union_round_trip(spark, tmp_path):
    """Round 6: general non-null multi-branch unions in the fallback
    (reference reads these via DuckDB's avro extension; spark-avro maps
    them to memberN structs — this follows the same convention). Writes
    a union-schema file with the pure-Python encoder, reads it back
    distributed without spark-avro on the classpath."""
    from vscode_parquet_visualizer_spark.sources.avro import (
        file_spark_schema,
        read_avro_fallback,
        write_avro,
    )

    schema = {
        "type": "record",
        "name": "U",
        "fields": [
            {"name": "id", "type": "long"},
            # general union: int | string | nested record, nullable
            {"name": "u", "type": [
                "null", "int", "string",
                {"type": "record", "name": "Pt",
                 "fields": [{"name": "x", "type": "int"}]},
            ]},
            # numeric widening unions collapse to one Spark type
            {"name": "n", "type": ["null", "int", "long"]},
            {"name": "f", "type": ["float", "double"]},
        ],
    }
    s = file_spark_schema(schema)
    kinds = {f.name: f.dataType.simpleString() for f in s.fields}
    assert kinds["u"] == "struct<member0:int,member1:string,member2:struct<x:int>>"
    assert s["u"].nullable
    assert kinds["n"] == "bigint" and s["n"].nullable
    assert kinds["f"] == "double" and not s["f"].nullable

    rows = [
        (0, {"member0": 7, "member1": None, "member2": None}, 5, 1.5),
        (1, {"member0": None, "member1": "hi", "member2": None}, None, 2.5),
        (2, {"member0": None, "member1": None, "member2": {"x": 3}},
         2**40, 0.25),
        (3, None, 1, 3.0),
    ]
    p = str(tmp_path / "u.avro")
    write_avro(p, schema, rows)
    back = {r["id"]: r for r in read_avro_fallback(spark, p).collect()}
    assert back[0]["u"]["member0"] == 7 and back[0]["u"]["member1"] is None
    assert back[1]["u"]["member1"] == "hi"
    assert back[2]["u"]["member2"]["x"] == 3
    assert back[3]["u"] is None
    assert back[2]["n"] == 2**40 and back[1]["n"] is None
    assert back[1]["f"] == 2.5 and back[3]["f"] == 3.0

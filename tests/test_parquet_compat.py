"""Exotic-codec parquet routing (sources/parquet_compat.py) — parity
with the reference's parquet-wasm second backend
(src/parquet-wasm-backend.ts:43-49): brotli files must open through the
same Engine/registry path as snappy ones."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vscode_parquet_visualizer_spark.sources import parquet_compat, registry

ROWS = {
    "i": [1, 2, 3, None],
    "s": ["a", "b", None, "d"],
    "f": [1.5, None, 2.25, -3.0],
    "d": [dt.date(2024, 1, 1), dt.date(2024, 6, 30), None, dt.date(1999, 12, 31)],
}


@pytest.fixture(scope="module")
def brotli_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pqc") / "brotli.parquet")
    pq.write_table(pa.table(ROWS), p, compression="BROTLI")
    return p


def test_codec_detection(brotli_file, sf_dir):
    assert parquet_compat.unsupported_codecs(brotli_file) == {"BROTLI"}
    # the driver-generated snappy/zstd test tables are all JVM-readable
    assert parquet_compat.unsupported_codecs(f"{sf_dir}/orders.parquet") == set()


def test_pyarrow_scan_roundtrip(spark, brotli_file):
    df = parquet_compat.read_parquet_pyarrow(spark, brotli_file)
    got = sorted(
        [tuple(r) for r in df.collect()], key=lambda r: (r[0] is None, r[0])
    )
    want = sorted(
        zip(ROWS["i"], ROWS["s"], ROWS["f"], ROWS["d"]),
        key=lambda r: (r[0] is None, r[0]),
    )
    assert got == [tuple(w) for w in want]


def test_registry_routes_brotli(spark, brotli_file):
    df = registry.read(spark, brotli_file)
    assert df.count() == 4 and set(df.columns) == set(ROWS)


def test_multi_row_group_parallel_decode(spark, tmp_path):
    p = str(tmp_path / "many.parquet")
    n = 10_000
    pq.write_table(
        pa.table({"x": list(range(n))}), p,
        compression="BROTLI", row_group_size=1000,
    )
    assert pq.ParquetFile(p).metadata.num_row_groups == 10
    df = parquet_compat.read_parquet_pyarrow(spark, p)
    # one task per row group, distributed — and exact content
    assert df.count() == n
    assert df.agg({"x": "sum"}).collect()[0][0] == n * (n - 1) // 2


def test_undecodable_codec_is_loud(tmp_path, monkeypatch):
    p = str(tmp_path / "f.parquet")
    pq.write_table(pa.table({"x": [1]}), p, compression="BROTLI")
    monkeypatch.setattr(parquet_compat, "_PYARROW_OK", set())
    with pytest.raises(NotImplementedError, match="BROTLI"):
        parquet_compat.read_parquet_pyarrow(None, p)


def test_engine_open_brotli(spark, brotli_file):
    # end-to-end: Engine.open -> query -> page on a brotli dataset
    from vscode_parquet_visualizer_spark.engine import Engine

    eng = Engine(spark=spark)
    ds = eng.open(brotli_file)
    rs = ds.query("SELECT i, s FROM data WHERE i IS NOT NULL ORDER BY i")
    assert [r["i"] for r in rs.page(1, 10)] == [1, 2, 3]


def test_fallback_ns_timestamp_parity(spark, tmp_path):
    """ns-timestamp columns must come back identical through the
    pyarrow fallback (brotli) and the native reader (nanosAsLong +
    _restore_nano_timestamps): TimestampType, truncated to µs."""
    tbl = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, 0, 0, 0, 123456)] * 2,
                pa.timestamp("ns"),
            ),
        }
    )
    pb, pn = str(tmp_path / "b.parquet"), str(tmp_path / "n.parquet")
    pq.write_table(tbl, pb, compression="BROTLI")
    pq.write_table(tbl, pn, compression="SNAPPY")
    a, b = registry.read(spark, pb), registry.read(spark, pn)
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_fallback_rejects_reader_options(spark, brotli_file):
    """The pyarrow scan can't honor JVM reader options — loud failure,
    not silent ignore."""
    with pytest.raises(NotImplementedError, match="reader options"):
        registry.read(spark, brotli_file, "parquet", mergeSchema=True)

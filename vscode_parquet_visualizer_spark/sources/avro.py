"""Pure-Python Apache Avro object-container-file codec + fallback reader.

The reference reads ``.avro`` through DuckDB's avro extension
(src/duckdb-backend.ts:152-164). Spark's own connector lives in the
external ``spark-avro`` jar, which is not on this container's classpath —
so this module implements the (public, stable) Avro 1.x container format
directly: magic ``Obj\\x01``, metadata map carrying the writer schema
JSON and codec, 16-byte sync marker, then length-prefixed row blocks
(null or deflate codec).

Scale shape: ``spark.read.format("binaryFile")`` distributes one file per
task and the block decoder runs inside ``mapInPandas`` — parallelism
tracks the file count, which is how Avro datasets are laid out at scale
(the format is append-oriented; a 100 TB Avro lake is tens of thousands
of files). The spark-avro jar additionally splits a single huge file on
sync markers; ``registry.read`` prefers the jar automatically when it is
on the classpath and only falls back here.

Supported schema surface: all primitives, records (incl. named-type
reuse), enums, fixed, arrays, maps, unions — 2-branch null unions map
onto nullability, numeric widening unions collapse ([int,long] → long,
[float,double] → double), and general multi-branch unions follow the
spark-avro convention of a struct with one ``memberN`` field per
non-null branch — and the common logical types (date,
timestamp-millis/micros, decimal, uuid).

A matching encoder (``write_avro``) exists so tests can produce real
container files without any Avro library.
"""

from __future__ import annotations

import datetime as dt
import decimal
import io
import json
import struct
import zlib
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

# --------------------------------------------------------------------------
# schema → Spark type
# --------------------------------------------------------------------------

_PRIMITIVES: dict[str, T.DataType] = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


def _resolve(schema: Any, names: dict[str, Any]) -> Any:
    """Named-type references ("some.Record") resolve to their definition."""
    if isinstance(schema, str) and schema in names:
        return names[schema]
    return schema


def _register(schema: dict, names: dict[str, Any]) -> None:
    name = schema.get("name")
    if name:
        ns = schema.get("namespace")
        names[name] = schema
        if ns:
            names[f"{ns}.{name}"] = schema


def to_spark_type(schema: Any, names: dict[str, Any] | None = None) -> tuple[T.DataType, bool]:
    """(DataType, nullable) for an Avro schema node."""
    names = names if names is not None else {}
    schema = _resolve(schema, names)
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return _PRIMITIVES[schema], schema == "null"
        raise ValueError(f"unknown Avro type name {schema!r}")
    if isinstance(schema, list):  # union
        non_null = [s for s in schema if s != "null"]
        nullable = len(non_null) < len(schema)
        if len(non_null) == 1:
            dtype, _ = to_spark_type(non_null[0], names)
            return dtype, True
        # Multi-branch unions follow the spark-avro convention: numeric
        # widenings collapse ([int,long] → long, [float,double] →
        # double); anything else becomes a struct with one memberN
        # field per non-null branch, exactly one non-null per value.
        prims = {s if isinstance(s, str) else None for s in non_null}
        if prims <= {"int", "long"}:
            return T.LongType(), nullable
        if prims <= {"float", "double"}:
            return T.DoubleType(), nullable
        fields = []
        for i, b in enumerate(non_null):
            dtype, _ = to_spark_type(b, names)
            fields.append(T.StructField(f"member{i}", dtype, True))
        return T.StructType(fields), nullable
    t = schema["type"]
    logical = schema.get("logicalType")
    if logical:
        if logical == "date" and t == "int":
            return T.DateType(), False
        if logical in ("timestamp-millis", "timestamp-micros") and t == "long":
            return T.TimestampType(), False
        if logical == "decimal" and t in ("bytes", "fixed"):
            return (
                T.DecimalType(schema["precision"], schema.get("scale", 0)),
                False,
            )
        if logical == "uuid" and t == "string":
            return T.StringType(), False
        # unknown logical type: fall through to the underlying type
    if t == "record":
        _register(schema, names)
        fields = []
        for f in schema["fields"]:
            dtype, nullable = to_spark_type(f["type"], names)
            fields.append(T.StructField(f["name"], dtype, nullable))
        return T.StructType(fields), False
    if t == "enum":
        _register(schema, names)
        return T.StringType(), False
    if t == "fixed":
        _register(schema, names)
        return T.BinaryType(), False
    if t == "array":
        dtype, nullable = to_spark_type(schema["items"], names)
        return T.ArrayType(dtype, containsNull=nullable), False
    if t == "map":
        dtype, nullable = to_spark_type(schema["values"], names)
        return T.MapType(T.StringType(), dtype, valueContainsNull=nullable), False
    if isinstance(t, (str,)) and t in _PRIMITIVES:
        return _PRIMITIVES[t], t == "null"
    return to_spark_type(t, names)


def file_spark_schema(schema: Any) -> T.StructType:
    """Top-level Spark schema: record fields, or a single ``value`` column."""
    dtype, nullable = to_spark_type(schema, {})
    if isinstance(dtype, T.StructType):
        return dtype
    return T.StructType([T.StructField("value", dtype, nullable)])


# --------------------------------------------------------------------------
# binary decoding
# --------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        if len(out) != n:
            raise EOFError("truncated Avro data")
        self.pos += n
        return out

    def read_long(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _decode_value(r: _Reader, schema: Any, names: dict[str, Any]) -> Any:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: long index then value
        idx = r.read_long()
        branch = schema[idx]
        v = _decode_value(r, branch, names)
        non_null = [s for s in schema if s != "null"]
        if len(non_null) <= 1:
            return v
        prims = {s if isinstance(s, str) else None for s in non_null}
        if prims <= {"int", "long"} or prims <= {"float", "double"}:
            return v  # numeric widening union: plain value
        if branch == "null":
            return None
        # memberN struct (dict: Arrow's pandas→struct accepts mappings)
        j = idx - (1 if "null" in schema and schema.index("null") < idx else 0)
        return {
            f"member{i}": (v if i == j else None)
            for i in range(len(non_null))
        }
    if isinstance(schema, str):
        t, logical = schema, None
        node: dict = {}
    else:
        t, logical, node = schema["type"], schema.get("logicalType"), schema
        if isinstance(t, (dict, list)):
            return _decode_value(r, t, names)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t == "int":
        v = r.read_long()
        if logical == "date":
            return dt.date(1970, 1, 1) + dt.timedelta(days=v)
        return v
    if t == "long":
        v = r.read_long()
        if logical == "timestamp-millis":
            return dt.datetime(1970, 1, 1) + dt.timedelta(milliseconds=v)
        if logical == "timestamp-micros":
            return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=v)
        return v
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        raw = r.read_bytes()
        if logical == "decimal":
            unscaled = int.from_bytes(raw, "big", signed=True)
            return decimal.Decimal(unscaled).scaleb(-node.get("scale", 0))
        return raw
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "record":
        _register(node, names)
        # dict, not tuple: Arrow's pandas→struct conversion (mapInPandas
        # output) accepts mappings for nested struct columns
        return {
            f["name"]: _decode_value(r, f["type"], names)
            for f in node["fields"]
        }
    if t == "enum":
        _register(node, names)
        return node["symbols"][r.read_long()]
    if t == "fixed":
        _register(node, names)
        raw = r.read(node["size"])
        if logical == "decimal":
            unscaled = int.from_bytes(raw, "big", signed=True)
            return decimal.Decimal(unscaled).scaleb(-node.get("scale", 0))
        return raw
    if t == "array":
        out = []
        while True:
            count = r.read_long()
            if count == 0:
                break
            if count < 0:
                r.read_long()  # block byte size, unused
                count = -count
            out.extend(
                _decode_value(r, node["items"], names) for _ in range(count)
            )
        return out
    if t == "map":
        out = {}
        while True:
            count = r.read_long()
            if count == 0:
                break
            if count < 0:
                r.read_long()
                count = -count
            for _ in range(count):
                key = r.read_bytes().decode("utf-8")
                out[key] = _decode_value(r, node["values"], names)
        return out
    raise ValueError(f"unsupported Avro type {t!r}")


def parse_header(data: bytes) -> tuple[Any, str, bytes, int]:
    """(writer schema, codec, sync marker, body offset) from file bytes."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    r = _Reader(data, 4)
    meta: dict[str, bytes] = {}
    while True:
        count = r.read_long()
        if count == 0:
            break
        if count < 0:
            r.read_long()
            count = -count
        for _ in range(count):
            key = r.read_bytes().decode("utf-8")
            meta[key] = r.read_bytes()
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync, r.pos


def decode_file(data: bytes) -> tuple[Any, list[tuple]]:
    """(writer schema, decoded rows). Rows are tuples for records,
    1-tuples otherwise — aligned with ``file_spark_schema``."""
    schema, codec, sync, pos = parse_header(data)
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"Avro codec {codec!r} not supported")
    is_record = isinstance(schema, dict) and schema.get("type") == "record"
    r = _Reader(data, pos)
    rows: list[tuple] = []
    while r.pos < len(data):
        n_rows = r.read_long()
        block = r.read_bytes()
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        br = _Reader(block)
        field_names = (
            [f["name"] for f in schema["fields"]] if is_record else None
        )
        for _ in range(n_rows):
            names: dict[str, Any] = {}
            v = _decode_value(br, schema, names)
            rows.append(
                tuple(v[name] for name in field_names) if is_record else (v,)
            )
        if r.read(16) != sync:
            raise ValueError("Avro sync marker mismatch (corrupt file)")
    return schema, rows


# --------------------------------------------------------------------------
# encoding (test/export support)
# --------------------------------------------------------------------------


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # Python ints are unbounded; emulate 64-bit zigzag
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _encode_value(out: io.BytesIO, schema: Any, v: Any, names: dict[str, Any]) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: pick branch by value
        non_null = [s for s in schema if s != "null"]
        if v is None:
            _write_long(out, schema.index("null"))  # no null branch: loud
            return None
        if len(non_null) == 1:
            branch = non_null[0]
        else:
            prims = {s if isinstance(s, str) else None for s in non_null}
            if prims <= {"int", "long"}:
                branch = "long" if "long" in prims else "int"
            elif prims <= {"float", "double"}:
                branch = "double" if "double" in prims else "float"
            else:
                # memberN struct value (dict from the reader, or a
                # positional sequence): the single non-null member
                # selects the branch
                members = {f"member{i}" for i in range(len(non_null))}
                if isinstance(v, dict) and set(v.keys()) == members:
                    vals = [v[f"member{i}"] for i in range(len(non_null))]
                else:
                    vals = list(v)
                j = next(
                    (i for i, x in enumerate(vals) if x is not None), None
                )
                if j is None:
                    _write_long(out, schema.index("null"))
                    return None
                branch = non_null[j]
                v = vals[j]
        idx = schema.index(branch)
        _write_long(out, idx)
        return _encode_value(out, branch, v, names)
    if isinstance(schema, str):
        t, node = schema, {}
    else:
        t, node = schema["type"], schema
    if t == "null":
        return None
    if t == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif t == "int" or t == "long":
        if isinstance(v, dt.date) and not isinstance(v, dt.datetime):
            v = (v - dt.date(1970, 1, 1)).days
        elif isinstance(v, dt.datetime):
            unit = 1000 if node.get("logicalType") == "timestamp-millis" else 1000000
            v = int((v - dt.datetime(1970, 1, 1)).total_seconds() * unit)
        _write_long(out, int(v))
    elif t == "float":
        out.write(struct.pack("<f", v))
    elif t == "double":
        out.write(struct.pack("<d", v))
    elif t == "bytes":
        _write_bytes(out, bytes(v))
    elif t == "string":
        _write_bytes(out, str(v).encode("utf-8"))
    elif t == "record":
        _register(node, names)
        vals = v if isinstance(v, (tuple, list)) else [v[f["name"]] for f in node["fields"]]
        for f, fv in zip(node["fields"], vals):
            _encode_value(out, f["type"], fv, names)
    elif t == "enum":
        _write_long(out, node["symbols"].index(v))
    elif t == "fixed":
        out.write(bytes(v))
    elif t == "array":
        if v:
            _write_long(out, len(v))
            for item in v:
                _encode_value(out, node["items"], item, names)
        _write_long(out, 0)
    elif t == "map":
        if v:
            _write_long(out, len(v))
            for key, val in v.items():
                _write_bytes(out, str(key).encode("utf-8"))
                _encode_value(out, node["values"], val, names)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def write_avro(
    path: str,
    schema: dict,
    rows: Any,
    codec: str = "null",
    block_rows: int = 1000,
) -> None:
    """Write an Avro object container file (null or deflate codec).
    ``rows`` is any iterable — blocks are encoded and flushed every
    ``block_rows``, so a streamed iterator never materializes fully."""
    import itertools

    sync = bytes(range(16))  # deterministic marker
    it = iter(rows)
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        head = io.BytesIO()
        _write_long(head, 2)
        _write_bytes(head, b"avro.schema")
        _write_bytes(head, json.dumps(schema).encode("utf-8"))
        _write_bytes(head, b"avro.codec")
        _write_bytes(head, codec.encode("utf-8"))
        _write_long(head, 0)
        fh.write(head.getvalue())
        fh.write(sync)
        while True:
            chunk = list(itertools.islice(it, block_rows))
            if not chunk:
                break
            body = io.BytesIO()
            for row in chunk:
                names: dict[str, Any] = {}
                _encode_value(body, schema, row, names)
            payload = body.getvalue()
            if codec == "deflate":
                cobj = zlib.compressobj(wbits=-15)
                payload = cobj.compress(payload) + cobj.flush()
            block = io.BytesIO()
            _write_long(block, len(chunk))
            _write_bytes(block, payload)
            fh.write(block.getvalue())
            fh.write(sync)


def from_spark_type(dtype: T.DataType, nullable: bool) -> Any:
    """Spark DataType → Avro schema node (inverse of ``to_spark_type``).
    Nullable fields become 2-branch null unions, date/timestamp get
    their logical types, structs become records with unique names."""
    counter = [0]

    def conv(dt_: T.DataType, nul: bool) -> Any:
        if isinstance(dt_, T.LongType):
            base: Any = "long"
        elif isinstance(dt_, (T.IntegerType, T.ShortType, T.ByteType)):
            base = "int"
        elif isinstance(dt_, T.DoubleType):
            base = "double"
        elif isinstance(dt_, T.FloatType):
            base = "float"
        elif isinstance(dt_, T.StringType):
            base = "string"
        elif isinstance(dt_, T.BooleanType):
            base = "boolean"
        elif isinstance(dt_, T.BinaryType):
            base = "bytes"
        elif isinstance(dt_, T.DateType):
            base = {"type": "int", "logicalType": "date"}
        elif isinstance(dt_, T.TimestampType):
            base = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(dt_, T.DecimalType):
            # decimals travel as doubles in the fallback writer (the
            # bytes encoding needs two's-complement scaffolding that
            # spark-avro provides when present); documented lossy
            base = "double"
        elif isinstance(dt_, T.ArrayType):
            base = {
                "type": "array",
                "items": conv(dt_.elementType, dt_.containsNull),
            }
        elif isinstance(dt_, T.MapType):
            if not isinstance(dt_.keyType, T.StringType):
                raise NotImplementedError(
                    "Avro maps require string keys; cast the key column"
                )
            base = {
                "type": "map",
                "values": conv(dt_.valueType, dt_.valueContainsNull),
            }
        elif isinstance(dt_, T.StructType):
            counter[0] += 1
            base = {
                "type": "record",
                "name": f"r{counter[0]}",
                "fields": [
                    {"name": f.name, "type": conv(f.dataType, f.nullable)}
                    for f in dt_.fields
                ],
            }
        else:
            raise NotImplementedError(
                f"no Avro mapping for Spark type {dt_.simpleString()}"
            )
        return ["null", base] if nul else base

    return conv(dtype, nullable)


def dataframe_avro_schema(df, name: str = "spark_export") -> dict:
    """Top-level Avro record schema for a DataFrame."""
    rec = from_spark_type(df.schema, False)
    rec["name"] = name
    return rec


def write_avro_fallback(
    df, path: str, codec: str = "deflate", block_rows: int = 1000
) -> None:
    """Single-file Avro export with the pure-Python container codec —
    the write-side twin of ``read_avro_fallback``, used when spark-avro
    is not on the classpath. Rows stream through the driver one at a
    time (``toLocalIterator`` — same single-file contract as the CSV /
    JSON / Excel exporters); for a distributed multi-file write install
    spark-avro.

    Value shapes: Row → tuple (the record encoder takes positional
    values), dict stays dict for maps, datetime/date handled by the
    encoder's logical-type paths."""
    schema = dataframe_avro_schema(df)

    def as_tuple(v: Any, dt_: T.DataType) -> Any:
        if v is None:
            return None
        if isinstance(dt_, T.StructType):
            return [
                as_tuple(x, f.dataType)
                for x, f in zip(v, dt_.fields)
            ]
        if isinstance(dt_, T.ArrayType):
            return [as_tuple(x, dt_.elementType) for x in v]
        if isinstance(dt_, T.MapType):
            return {k: as_tuple(x, dt_.valueType) for k, x in v.items()}
        if isinstance(dt_, T.DecimalType):
            return float(v)
        return v

    rows = (
        as_tuple(row, df.schema) for row in df.toLocalIterator()
    )
    write_avro(path, schema, rows, codec=codec, block_rows=block_rows)


# --------------------------------------------------------------------------
# distributed fallback reader
# --------------------------------------------------------------------------


def read_avro_fallback(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read without the spark-avro jar.

    Plan: ``binaryFile`` scan (one row per file, executor-side content) →
    ``mapInPandas`` decoding each file's blocks into rows. The driver
    parses only the first file's header for the schema. File-level
    parallelism; see module docstring for the scale rationale.
    """
    import pandas as pd

    from vscode_parquet_visualizer_spark.session import ship_package

    ship_package(spark)
    if path.endswith(".avro") or path.endswith("*"):
        load_path = path
    else:  # directory: binaryFile needs a glob to select the avro files
        load_path = path.rstrip("/") + "/*.avro"
    files = spark.read.format("binaryFile").load(load_path)
    first = files.select("content").first()
    if first is None:
        raise FileNotFoundError(f"no Avro files at {path}")
    schema, _, _, _ = parse_header(bytes(first["content"]))
    spark_schema = file_spark_schema(schema)
    is_record = isinstance(schema, dict) and schema.get("type") == "record"
    col_names = [f.name for f in spark_schema.fields]

    def decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                _, rows = decode_file(bytes(content))
                yield pd.DataFrame.from_records(rows, columns=col_names)

    return files.select("content").mapInPandas(decode, schema=spark_schema)

"""DESCRIBE / SUMMARIZE statement surfaces (DuckDB-shaped).

The reference passes user statements to DuckDB verbatim
(src/duckdb-backend.ts:142-146), so a DuckDB-habituated user can type
``DESCRIBE <query>`` or ``SUMMARIZE <table>`` into the query tab and get
DuckDB's introspection shapes back. This module reproduces both shapes on
Spark:

- ``DESCRIBE`` → one row per column: ``column_name, column_type, null,
  key, default, extra`` — the same contract as the schema tab
  (functions/schema_format.schema_rows), with DuckDB type spellings, so
  the output value-matches DuckDB running the identical statement.
- ``SUMMARIZE`` → DuckDB's 12-column profile: ``column_name, column_type,
  min, max, approx_unique, avg, std, q25, q50, q75, count,
  null_percentage``. Computed in ONE distributed aggregation pass over
  the relation (only the final per-column profile row is collected), so
  it scales with the input like any other aggregate. ``approx_unique``
  uses HLL (`approx_count_distinct`) and q25/q50/q75 use
  ``percentile_approx`` — the same sketch-based semantics DuckDB's
  SUMMARIZE uses, so those columns are engine-specific by design while
  min/max/count/null_percentage are exact.
"""

from __future__ import annotations

from decimal import Decimal

from vscode_parquet_visualizer_spark.session import local_df
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vscode_parquet_visualizer_spark.functions.schema_format import (
    duckdb_type_string,
)

_DESCRIBE_SCHEMA = T.StructType(
    [
        T.StructField("column_name", T.StringType()),
        T.StructField("column_type", T.StringType()),
        T.StructField("null", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("default", T.StringType()),
        T.StructField("extra", T.StringType()),
    ]
)

_SUMMARIZE_SCHEMA = T.StructType(
    [
        T.StructField("column_name", T.StringType()),
        T.StructField("column_type", T.StringType()),
        T.StructField("min", T.StringType()),
        T.StructField("max", T.StringType()),
        T.StructField("approx_unique", T.LongType()),
        T.StructField("avg", T.StringType()),
        T.StructField("std", T.StringType()),
        T.StructField("q25", T.StringType()),
        T.StructField("q50", T.StringType()),
        T.StructField("q75", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("null_percentage", T.DecimalType(5, 2)),
    ]
)

_UNORDERABLE = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


def describe_df(spark: SparkSession, df: DataFrame) -> DataFrame:
    """DuckDB ``DESCRIBE``-shaped relation for ``df``'s schema. Pure
    analysis — no job runs."""
    rows = [
        (
            f.name,
            duckdb_type_string(f.dataType),
            "YES" if f.nullable else "NO",
            None,
            None,
            None,
        )
        for f in df.schema.fields
    ]
    return local_df(spark, rows, _DESCRIBE_SCHEMA)


def _is_numeric(dtype: T.DataType) -> bool:
    return isinstance(dtype, T.NumericType)


def summarize_df(spark: SparkSession, df: DataFrame) -> DataFrame:
    """DuckDB ``SUMMARIZE``-shaped per-column profile in one distributed
    aggregation pass."""
    aggs: list = [F.count(F.lit(1)).alias("__rows")]
    for f in df.schema.fields:
        c, q = f.name, f"`{f.name}`"
        aggs.append(F.sum(F.col(q).isNull().cast("long")).alias(f"{c}\x00nulls"))
        aggs.append(F.approx_count_distinct(q).alias(f"{c}\x00uniq"))
        if not isinstance(f.dataType, _UNORDERABLE):
            aggs.append(F.min(q).cast("string").alias(f"{c}\x00min"))
            aggs.append(F.max(q).cast("string").alias(f"{c}\x00max"))
        if _is_numeric(f.dataType):
            aggs.append(F.avg(q).cast("string").alias(f"{c}\x00avg"))
            aggs.append(F.stddev_samp(q).cast("string").alias(f"{c}\x00std"))
            aggs.append(
                F.percentile_approx(q, [0.25, 0.5, 0.75]).alias(f"{c}\x00q")
            )
    prof = df.agg(*aggs).first().asDict()
    total = prof["__rows"]
    rows = []
    for f in df.schema.fields:
        c = f.name
        nulls = prof[f"{c}\x00nulls"] or 0
        quart = prof.get(f"{c}\x00q") or [None, None, None]
        pct = (
            Decimal(100 * nulls) / Decimal(total) if total else Decimal(0)
        ).quantize(Decimal("0.01"))
        rows.append(
            (
                c,
                duckdb_type_string(f.dataType),
                prof.get(f"{c}\x00min"),
                prof.get(f"{c}\x00max"),
                prof[f"{c}\x00uniq"],
                prof.get(f"{c}\x00avg"),
                prof.get(f"{c}\x00std"),
                None if quart[0] is None else str(quart[0]),
                None if quart[1] is None else str(quart[1]),
                None if quart[2] is None else str(quart[2]),
                total,
                pct,
            )
        )
    return local_df(spark, rows, _SUMMARIZE_SCHEMA)

"""Structured Streaming over the events table (beyond-reference scope —
the reference is batch-only, SURVEY.md §1.1/§2B last row).

The same event schema the batch engine reads
(event_id, ts, user_id, event_type, value, props) treated as a stream:

- ``windowed_counts``: tumbling/sliding window aggregation with a
  watermark for late data.
- ``sessionize``: session windows per user (gap-based).
- ``stateful_running_value``: custom per-user running state via
  ``applyInPandasWithState`` (the escape hatch for operators the built-in
  stateful ops can't express).

All take a streaming DataFrame (``spark.readStream``); tests drive them
with the file source reading the parquet testdata dir (one file = one
micro-batch) and a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_events_stream(spark, path: str, schema: T.StructType | None = None) -> DataFrame:
    """File-source stream over a directory of event parquet files.

    Spark's file stream source requires a *directory* (each new file = one
    micro-batch); a single-file path is wrapped via a symlinked temp dir so
    the same call works on the testdata layout."""
    import hashlib
    import os
    import tempfile

    from vscode_parquet_visualizer_spark.sources.registry import (
        _nano_timestamp_columns,
    )

    if schema is None:
        # raw on-disk schema (ns timestamps surface as int64 under
        # nanosAsLong) — the conversion happens inside the stream below
        schema = spark.read.parquet(path).schema
    nano_cols = _nano_timestamp_columns(path)
    raw_schema = T.StructType(
        [
            T.StructField(f.name, T.LongType() if f.name in nano_cols else f.dataType, f.nullable)
            for f in schema.fields
        ]
    )
    if os.path.isfile(path):
        tag = hashlib.md5(path.encode()).hexdigest()[:12]
        d = os.path.join(tempfile.gettempdir(), f"stream_src_{tag}")
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, os.path.basename(path))
        if not os.path.exists(link):
            os.symlink(path, link)
        path = d
    stream = spark.readStream.schema(raw_schema).parquet(path)
    for c in nano_cols:
        stream = stream.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return stream


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) windowed counts + value sums per event_type,
    watermarked so state for closed windows is dropped — the canonical
    late-data-tolerant streaming aggregation."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user (built-in session_window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("running_total", T.DoubleType()),
        T.StructField("running_n", T.LongType()),
    ]
)


def stateful_running_value(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running total/count across
    micro-batches via applyInPandasWithState (GroupState). Demonstrates
    the pattern for operators outside the built-in stateful set."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        total, n = (state.get if state.exists else (0.0, 0))
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += int(len(pdf))
        state.update((total, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "running_total": [total], "running_n": [n]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_parquet(
    stream_df: DataFrame,
    path: str,
    output_mode: str = "complete",
):
    """Drive a streaming DF to a parquet directory via ``foreachBatch`` —
    the executors write the files, nothing is materialized on the driver.

    The memory sink collects every output row into driver heap; fine for
    a handful of aggregates, a scale-killer for large results (q72's
    sessionization emits ~1 row per input event — ~1 M rows at sf1, and
    at 100 TB no driver holds the output). ``complete`` mode overwrites
    the directory with the full state each batch (the last batch leaves
    the final result); ``append`` mode appends each batch's new rows.
    Returns the output path for re-reading."""
    import shutil

    if output_mode == "append":
        shutil.rmtree(path, ignore_errors=True)

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        mode = "overwrite" if output_mode == "complete" else "append"
        batch_df.write.mode(mode).parquet(path)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return path


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    once: bool = True,
    output_mode: str = "append",
):
    """Drive a streaming DF into a memory sink (test/bench harness).

    ``output_mode`` defaults to ``append`` — the only mode every
    streaming plan supports; pass ``complete`` explicitly for full
    aggregations (inferring ``complete`` from ``isStreaming`` raised
    AnalysisException for watermarked dedup / stream-stream joins /
    update-mode stateful ops)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if once:
        q.awaitTermination()
    return q

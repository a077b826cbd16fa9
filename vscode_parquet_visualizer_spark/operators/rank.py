"""Distributed rank: global per-partition row numbers without Spark's
one-task-per-window-partition wall.

Spark's WindowExec places EVERY row of a window partition on one task,
so ``row_number() OVER (PARTITION BY low_card_key ORDER BY …)`` over a
3-value key serializes the whole fact table onto 3 tasks — at sf10 that
is 3 single-threaded 5M-row sorts (q59 measured 13.5 s), and at 100 TB
it simply does not run. The reference's engine (embedded DuckDB,
src/duckdb-backend.ts:142-146 pass-through) pays the same wall as a
single-node sort.

The scalable shape (the same trick ``positional.py`` uses for global
row position):

1. ``repartitionByRange`` + ``sortWithinPartitions`` on
   (partition keys, order keys) — one PARALLEL range-shuffle sort, the
   only data-sized movement.
2. ``monotonically_increasing_id`` on the sorted, locally-checkpointed
   result is per-Spark-partition consecutive, so the local index of a
   row within its (spark partition, window partition) group is
   ``mid - min(mid)`` of the group.
3. One tiny stats job — ``groupBy(spark_pid, partition keys)`` →
   (count, min id) — gives every group's prefix sum; a literal
   ``create_map`` keyed on (pid, partition keys) turns local indexes
   into GLOBAL 1-based row numbers and attaches each window partition's
   total row count. No second shuffle of the data, no skew wall: work
   per task is bounded by the range partitioner, not by key
   cardinality.

Semantics: ``__rn`` is ``row_number()`` under a TOTAL order — callers
must include a unique tiebreaker in ``order_cols`` (rank/dense_rank
coincide with row_number exactly then; with ties they'd need a
distinct-key pass this operator deliberately does not hide).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"


def with_row_numbers(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column],
    num_partitions: int | None = None,
    rn_col: str = "__rn",
    n_col: str = "__pn",
) -> DataFrame:
    """Return ``df`` plus ``rn_col`` (1-based global row number within
    ``partition_cols`` under ``order_cols`` — which must be a total
    order) and ``n_col`` (the window partition's row count)."""
    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    sort_exprs = [F.col(c) for c in partition_cols] + list(order_cols)
    sorted_df = (
        df.repartitionByRange(parts, *sort_exprs)
        .sortWithinPartitions(*sort_exprs)
        .withColumns(
            {
                "__pid": F.spark_partition_id(),
                "__mid": F.monotonically_increasing_id(),
            }
        )
        .localCheckpoint(eager=False)  # both passes see identical ids
    )
    stats = (
        sorted_df.groupBy("__pid", *partition_cols)
        .agg(F.count(F.lit(1)).alias("__n"), F.min("__mid").alias("__m0"))
        .collect()
    )
    # prefix sums per window partition, in (partition key, pid) order —
    # the range partitioner laid a window partition's rows across a
    # contiguous, increasing pid span, so pid order IS global order
    def keyof(r):
        # NULL partition keys: concat_ws SKIPS null columns, so encode
        # NULL as a sentinel on both the driver and column sides
        return tuple(
            "\x00NULL" if r[c] is None else str(r[c])
            for c in partition_cols
        )

    totals: dict[tuple, int] = {}
    for r in stats:
        totals[keyof(r)] = totals.get(keyof(r), 0) + r["__n"]
    adjust_entries: list[Column] = []
    count_entries: list[Column] = []
    running: dict[tuple, int] = {}
    for r in sorted(stats, key=lambda r: (keyof(r), r["__pid"])):
        k = keyof(r)
        off = running.get(k, 0)
        running[k] = off + r["__n"]
        mk = _SEP.join((str(r["__pid"]), *k))
        # global rn = mid - m0 + off + 1  →  mid + (off - m0 + 1)
        adjust_entries.extend((F.lit(mk), F.lit(off - r["__m0"] + 1)))
        count_entries.extend((F.lit(mk), F.lit(totals[k])))
    if not adjust_entries:  # empty input
        return (
            sorted_df.withColumn(rn_col, F.lit(1).cast("long"))
            .withColumn(n_col, F.lit(0).cast("long"))
            .drop("__pid", "__mid")
        )
    mkey = F.concat_ws(
        _SEP,
        F.col("__pid").cast("string"),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in partition_cols
        ],
    )
    out = (
        sorted_df.withColumn(
            rn_col,
            (F.col("__mid") + F.create_map(*adjust_entries)[mkey]).cast(
                "long"
            ),
        )
        .withColumn(n_col, F.create_map(*count_entries)[mkey].cast("long"))
        .drop("__pid", "__mid")
    )
    return out


def ntile_from_rn(rn: Column, n: Column, buckets: int) -> Column:
    """SQL ``ntile(buckets)`` computed from (row number, partition
    count): the first ``n % buckets`` buckets take ``n div buckets + 1``
    rows, the rest ``n div buckets`` (ANSI semantics, matching both
    Spark's and DuckDB's ntile)."""
    size = F.floor(n / buckets)
    rem = n % buckets
    big = rem * (size + 1)
    return (
        F.when(rn <= big, F.ceil(rn / (size + 1)))
        .otherwise(rem + F.ceil((rn - big) / size))
        .cast("long")
    )

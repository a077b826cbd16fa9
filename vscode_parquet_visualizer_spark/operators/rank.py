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
   (count, min id) — gives every group's prefix sum; the fix-up keyed
   on (pid, partition keys) turns local indexes into GLOBAL 1-based
   row numbers and attaches each window partition's total row count.
   Up to ``_MAP_LITERAL_MAX`` groups this is a literal ``create_map``
   (no extra join in the plan); above it — e.g. 10⁵ tasks × many
   window partitions on a real cluster, where the literal expression
   itself would bottleneck the driver — it is a broadcast join on the
   tiny stats DataFrame. No second shuffle of the data, no skew wall:
   work per task is bounded by the range partitioner, not by key
   cardinality.

The stats groupBy runs on an ENGINE-rendered string key column (one
``concat_ws`` of ``CAST(col AS STRING)``), never on driver-side Python
``str()`` renderings — Python ``str(True)``/``str(1e-07)`` differ from
Spark's ``true``/``1.0E-7``, which would silently miss the map lookup
for boolean/float/timestamp partition columns.

Semantics: ``__rn`` is ``row_number()`` under a TOTAL order — callers
must include a unique tiebreaker in ``order_cols`` (rank/dense_rank
coincide with row_number exactly then; with ties they'd need a
distinct-key pass this operator deliberately does not hide).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"

# Above this many (spark pid × window partition) stats groups the
# create_map literal stops being free: the expression tree itself is
# built (and serialized to every task) on the driver, so at cluster
# scale (10⁵ tasks × many partitions) it becomes a driver bottleneck.
# A broadcast join on the tiny stats DataFrame costs one extra plan
# node but is O(1) in expression size — the 100×-safe spelling.
_MAP_LITERAL_MAX = 1000


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
    # ENGINE-rendered window-partition key: grouping and lookup both use
    # this exact string, so no driver-side Python rendering of values
    # ever happens (Python str(True)='True' vs Spark 'true' etc.).
    # NULL keys: concat_ws SKIPS null columns, so encode NULL as a
    # sentinel before concatenation.
    wkey = F.concat_ws(
        _SEP,
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in partition_cols
        ],
    )
    sorted_df = (
        df.repartitionByRange(parts, *sort_exprs)
        .sortWithinPartitions(*sort_exprs)
        .withColumns(
            {
                "__pid": F.spark_partition_id(),
                "__mid": F.monotonically_increasing_id(),
                "__wkey": wkey,
            }
        )
        .localCheckpoint(eager=False)  # both passes see identical ids
    )
    stats = (
        sorted_df.groupBy("__pid", "__wkey")
        .agg(F.count(F.lit(1)).alias("__n"), F.min("__mid").alias("__m0"))
        .collect()
    )
    if not stats:  # empty input
        return (
            sorted_df.withColumn(rn_col, F.lit(1).cast("long"))
            .withColumn(n_col, F.lit(0).cast("long"))
            .drop("__pid", "__mid", "__wkey")
        )
    # prefix sums per window partition, in (partition key, pid) order —
    # the range partitioner laid a window partition's rows across a
    # contiguous, increasing pid span, so pid order IS global order
    totals: dict[str, int] = {}
    for r in stats:
        totals[r["__wkey"]] = totals.get(r["__wkey"], 0) + r["__n"]
    fixups: list[tuple[int, str, int, int]] = []  # pid, wkey, adjust, n
    running: dict[str, int] = {}
    for r in sorted(stats, key=lambda r: (r["__wkey"], r["__pid"])):
        k = r["__wkey"]
        off = running.get(k, 0)
        running[k] = off + r["__n"]
        # global rn = mid - m0 + off + 1  →  mid + (off - m0 + 1)
        fixups.append((r["__pid"], k, off - r["__m0"] + 1, totals[k]))
    if len(fixups) <= _MAP_LITERAL_MAX:
        adjust_entries: list[Column] = []
        count_entries: list[Column] = []
        for pid, k, adj, tot in fixups:
            mk = f"{pid}{_SEP}{k}"
            adjust_entries.extend((F.lit(mk), F.lit(adj)))
            count_entries.extend((F.lit(mk), F.lit(tot)))
        mkey = F.concat_ws(_SEP, F.col("__pid").cast("string"), F.col("__wkey"))
        out = (
            sorted_df.withColumn(
                rn_col,
                (F.col("__mid") + F.create_map(*adjust_entries)[mkey]).cast(
                    "long"
                ),
            )
            .withColumn(
                n_col, F.create_map(*count_entries)[mkey].cast("long")
            )
        )
    else:
        stats_df = F.broadcast(
            spark.createDataFrame(
                fixups, "__pid int, __wkey string, __adj long, __tot long"
            )
        )
        out = (
            sorted_df.join(stats_df, ["__pid", "__wkey"], "left")
            .withColumn(rn_col, (F.col("__mid") + F.col("__adj")).cast("long"))
            .withColumn(n_col, F.col("__tot").cast("long"))
            .drop("__adj", "__tot")
        )
    return out.drop("__pid", "__mid", "__wkey")


def percent_rank_from_rn(
    rn: Column, n: Column, digits: int | None = None
) -> Column:
    """SQL ``percent_rank()`` computed from (row number under a total
    order, partition count): (rn-1)/(n-1), defined 0 for a single-row
    partition — where the naive quotient is 0/0 → NULL in non-ANSI
    Spark but percent_rank() returns 0 in every engine."""
    pr = (rn - 1) / (n - 1)
    if digits is not None:
        pr = F.round(pr, digits)
    return F.when(n == 1, F.lit(0.0)).otherwise(pr)


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

"""POSITIONAL JOIN (DuckDB: zip two relations by row position, shorter
side null-padded — reference surface via pass-through SQL,
src/duckdb-backend.ts:142-146).

No distributed engine has an implicit global row order, so the position
key is materialized explicitly — entirely JVM-side (no ``df.rdd``
round-trip, which would deserialize every row into Python and back):
``spark_partition_id`` + ``monotonically_increasing_id`` give each row
its partition and a per-partition-consecutive local id; one small
aggregation job learns per-partition (count, min id), and a broadcast
prefix-sum join turns them into the global position
``offset[pid] + (id - min_id[pid])``. No single-partition window, no
shuffle beyond the final position-keyed join. Scan order = (input
split order, row order within split), which matches file order for
parquet scans — the same contract DuckDB's positional semantics rely
on. The input is locally checkpointed before the stats job so both
passes (stats, join) see the identical partitioning and id assignment
even over nondeterministic upstreams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_pos(df: DataFrame) -> DataFrame:
    part = df.withColumns(
        {
            "__pid": F.spark_partition_id(),
            "__mid": F.monotonically_increasing_id(),
        }
    ).localCheckpoint(eager=False)  # materialized by the stats job below
    stats = (
        part.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"), F.min("__mid").alias("__m0"))
        .collect()
    )
    # Fold the per-partition prefix-sum into a literal map expression:
    # pos = mid + (global_offset[pid] - min_mid[pid]). One tiny collect
    # (|partitions| rows — the same array zipWithIndex ships) and zero
    # extra joins/broadcasts: a broadcast of a driver-built DataFrame
    # costs a separate Python-RDD job per evaluation, measured ~6 s of
    # pure overhead on a 25-row input.
    entries, offset = [], 0
    for r in sorted(stats, key=lambda r: r["__pid"]):
        entries.extend(
            (F.lit(r["__pid"]), F.lit(offset - r["__m0"]))
        )
        offset += r["__n"]
    if not entries:  # empty relation: no partitions reported
        return part.withColumn("__pos", F.col("__mid")).drop("__pid", "__mid")
    adjust = F.create_map(*entries)[F.col("__pid")]
    return (
        part.withColumn("__pos", F.col("__mid") + adjust)
        .drop("__pid", "__mid")
    )


def positional_join(
    left: DataFrame, right: DataFrame, suffix: str = "_right"
) -> DataFrame:
    """Zip by row position; full-outer on the position key so the longer
    side survives with nulls (DuckDB semantics). Right columns colliding
    with left names come back suffixed."""
    renamed = {
        c: (c + suffix if c in left.columns else c) for c in right.columns
    }
    r = _with_pos(right)
    for old, new in renamed.items():
        if old != new:
            r = r.withColumnRenamed(old, new)
    out = (
        _with_pos(left)
        .join(r, "__pos", "full_outer")
        .orderBy("__pos")
    )
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(renamed[c]) for c in right.columns],
    )

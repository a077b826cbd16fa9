"""Range (interval) join: match left points to right intervals
(``left.t BETWEEN right.lo AND right.hi``).

Spark executes a raw BETWEEN theta join as BroadcastNestedLoopJoin —
O(|L|·|R|) and only viable when one side broadcasts. The scalable plan
(same idea DuckDB/TimescaleDB use internally for range joins) buckets the
domain: points land in one bucket, intervals explode to every bucket they
overlap, and the join becomes an equi-join on the bucket key followed by
an exact BETWEEN filter. Cost: |L| + Σ interval_span/bucket_width rows
shuffled on a well-distributed key, instead of a cross product.

``bucket_width`` tunes replication vs selectivity: ~median interval width
is a good default (each interval explodes to ~2 buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    extra_on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-bucketed interval join. Numeric/epoch domains (cast timestamps
    to ``unix_millis``/``unix_micros`` first). ``extra_on``: additional
    equality keys (joined before the range filter — they also co-locate
    the shuffle).

    ``how``: ``inner`` or ``left``. For ``left`` the BETWEEN predicate is
    part of the JOIN CONDITION (not a post-join filter, which would
    silently drop a point whose bucket matched interval rows but none
    satisfied the range): each point lives in exactly ONE bucket, so a
    single left outer join emits exactly one null-padded row per
    unmatched point — deterministic, no row-id bookkeeping, one join
    instead of inner ∪ anti.
    """
    extra_on = extra_on or []
    if how not in ("inner", "left"):
        raise ValueError(
            f"range_join supports how='inner'|'left', got {how!r}"
        )
    pt = points.withColumn(
        "__bucket", (F.col(point_col) / bucket_width).cast("long")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(lo_col) / bucket_width).cast("long"),
                (F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    if how == "inner":
        return (
            pt.join(iv, ["__bucket", *extra_on], "inner")
            .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
            .drop("__bucket")
        )
    p, i = pt.alias("__p"), iv.alias("__i")
    cond = F.col("__p.__bucket") == F.col("__i.__bucket")
    for k in extra_on:
        cond = cond & (F.col(f"__p.{k}") == F.col(f"__i.{k}"))
    cond = cond & F.col(f"__p.{point_col}").between(
        F.col(f"__i.{lo_col}"), F.col(f"__i.{hi_col}")
    )
    out_cols = [F.col(f"__p.{c}") for c in points.columns] + [
        F.col(f"__i.{c}") for c in intervals.columns if c not in extra_on
    ]
    return p.join(i, cond, "left").select(*out_cols)


def time_bucket(ts: Column, width_seconds: int) -> Column:
    """Timescale-style time_bucket: epoch floored to the bucket start,
    returned as epoch seconds (deterministic, tz-free)."""
    return (F.unix_timestamp(ts) / width_seconds).cast("long") * width_seconds


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    widths_seconds: list[int],
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Multi-resolution time rollup in ONE pass: every row is exploded to
    its (width, bucket) pairs and aggregated grouped by (width, bucket,
    group_cols) — the continuous-aggregate table serving any of the
    requested resolutions. One shuffle total instead of one per
    resolution; rows grow |widths|× before the (partial) aggregation
    collapses them map-side."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(w).alias("width"),
                time_bucket(F.col(ts_col), w).alias("bucket_epoch"),
            )
            for w in widths_seconds
        ]
    )
    exploded = df.withColumn("__wb", F.explode(pairs))
    return (
        exploded.groupBy(
            F.col("__wb.width").alias("width"),
            F.col("__wb.bucket_epoch").alias("bucket_epoch"),
            *group_cols,
        ).agg(*aggs)
    )

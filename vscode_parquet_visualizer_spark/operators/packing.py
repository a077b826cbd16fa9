"""Sequence packing: assign documents to ~budget-sized shards.

Training pipelines shard a corpus into fixed token-budget packs (batch
files, context-window groups). The scalable deterministic scheme is
*contiguous greedy packing*: within each group, order documents by a
stable key, take the running token total, and cut a new pack every time
the exclusive prefix sum crosses a multiple of the budget::

    pack = floor( (cumsum(tokens) - tokens) / budget )

One shuffle on the group key + one window sort — the same cost as any
windowed aggregate, no driver loop, no state. A pack can overshoot the
budget by at most one document (the standard streaming-packing bound);
an exact bin-packing would be a sequential algorithm that doesn't
distribute. The formula is plain SQL, so the DuckDB oracle runs it
verbatim (workload q98).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    order_col: str,
    group_cols: list[str] | None = None,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Add ``pack_col``: the 0-based pack index within each group.

    ``order_col`` must be a stable unique key (doc id) — determinism of
    the packing is determinism of this ordering. Oversized single
    documents (tokens > budget) get a pack of their own, never silently
    dropped."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    group_cols = group_cols or []
    w = Window.partitionBy(*group_cols).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    return df.withColumn(
        pack_col,
        F.floor((cum - F.col(tokens_col)) / F.lit(budget)).cast("long"),
    )


def pack_manifest(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    order_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-pack summary (docs, tokens) — the shard manifest a writer
    consumes. Group keys + pack_id identify a shard."""
    group_cols = group_cols or []
    packed = pack_sequences(df, tokens_col, budget, order_col, group_cols)
    return packed.groupBy(*group_cols, "pack_id").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.col(tokens_col)).alias("tokens"),
    )

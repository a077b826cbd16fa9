"""Stream-stream joins with watermark-bounded state.

The canonical hard streaming operator: joining two unbounded streams is
only possible when the engine can bound how long it must buffer each side.
Watermarks + a time-range join condition give Spark that bound — rows
outside the interval are dropped from state automatically.

``purchases_with_prior_views``: for each purchase event, every view by the
same user within ``lookback`` before it — the streaming analogue of the
batch as-of/range join (operators/asof.py, operators/range_join.py), with
state bounded by watermark + interval instead of a finished dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_with_prior_views(
    events: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Join purchase events to prior view events of the same user within
    ``lookback``. Both sides are watermarked so the join state for either
    side is dropped once the interval can no longer match."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return purchases.join(views, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        "p_ts",
        "v_ts",
        "purchase_value",
    )

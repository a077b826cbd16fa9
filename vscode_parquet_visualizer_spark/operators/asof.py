"""As-of join (SURVEY.md §2B joins row: DuckDB ``ASOF JOIN``).

For each left row, match the single right row with the greatest ``right.on``
that is ``<= left.on`` (backward direction; ``>=`` for forward), optionally
within equality ``by`` keys — the standard time-series alignment operator.

Spark has no ASOF JOIN. Two implementations:

- ``asof_join``: **union + window** — tag both sides, union on (by, on),
  and carry the last non-null right row forward with
  ``last(..., ignorenulls=True)`` over an unbounded-preceding window.
  One shuffle (the window's partitionBy), no row explosion, no Python.
  This is the scale path: at 100 TB it's a single sort-based window per
  ``by`` partition; skewed ``by`` keys hit the same limits any windowed
  plan does (AQE skew handling does not apply to windows — salt upstream
  if a single key dominates).

- ``asof_join_pandas``: per-group ``pandas.merge_asof`` via
  ``applyInPandas`` (cogroup). Simpler semantics (tolerance support),
  Arrow-batched, but pays Python serialization; kept for tolerance
  queries and as a cross-check of the native plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    how: str = "left",
    right_on_as: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Union+window as-of join. Right value columns come back suffixed when
    they collide with left names. ``direction``: backward | forward |
    nearest (ties prefer backward, pandas semantics). ``how``: 'left'
    keeps unmatched left rows with nulls; 'inner' drops them (DuckDB's
    default ASOF JOIN semantics). ``right_on_as`` optionally exposes the
    MATCHED right ``on`` value under that column name — deterministic
    even when several right rows tie on the timestamp. ``strict``
    excludes equal timestamps (DuckDB ``>`` / ``<`` ASOF conditions vs
    the ties-inclusive ``>=`` / ``<=``): in the union's window sort,
    right rows move *after* left rows at equal ``on``, so the running
    ``last`` at a left row has only strictly-earlier right rows in
    scope — same one-shuffle plan."""
    by = by or []
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    if strict and direction == "nearest":
        raise ValueError("strict is not defined for direction='nearest'")

    left_cols = [c for c in left.columns]
    right_vals = [c for c in right.columns if c != on and c not in by]
    renamed = {
        c: (c + suffix if c in left_cols else c) for c in right_vals
    }

    # Tag and align the two sides on a common shape. The right-row struct
    # carries its own `on` value (__r_on) so `nearest` can compare distances.
    rrow_fields = [F.col(on).alias("__r_on")] + [
        F.col(c).alias(renamed[c]) for c in right_vals
    ]
    lhs = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__on"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__lrow"),
        F.lit(None).cast(
            right.select(F.struct(*rrow_fields)).schema[0].dataType
        ).alias("__rrow"),
    )
    rhs = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__on"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left_cols])).schema[0].dataType
        ).alias("__lrow"),
        F.struct(*rrow_fields).alias("__rrow"),
    )
    unioned = lhs.unionByName(rhs)

    part = [F.col(c) for c in by]
    # Backward: right rows sort before left rows at equal timestamps so a
    # tie matches (asof uses <=); carry last right row forward. Forward is
    # the mirror image; nearest computes both over the same union and
    # picks the closer match per row. Strict flips the tiebreak so right
    # rows at an equal timestamp fall outside the frame.
    tiebreak = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    w_back = (
        Window.partitionBy(*part)
        .orderBy(F.col("__on").asc(), tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*part)
        .orderBy(F.col("__on").desc(), tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if direction == "backward":
        matched = unioned.withColumn(
            "__match", F.last("__rrow", ignorenulls=True).over(w_back)
        )
    elif direction == "forward":
        matched = unioned.withColumn(
            "__match", F.last("__rrow", ignorenulls=True).over(w_fwd)
        )
    else:  # nearest
        b = F.last("__rrow", ignorenulls=True).over(w_back)
        f = F.last("__rrow", ignorenulls=True).over(w_fwd)
        dist_b = F.abs(F.col("__on") - b["__r_on"])
        dist_f = F.abs(F.col("__on") - f["__r_on"])
        matched = unioned.withColumn(
            "__match",
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(dist_f < dist_b, f)
            .otherwise(b),  # ties → backward
        )
    matched = matched.filter(F.col("__is_left") == 1)
    if how == "inner":
        matched = matched.filter(F.col("__match").isNotNull())

    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left_cols]
    out_cols += [
        F.col(f"__match.{renamed[c]}").alias(renamed[c]) for c in right_vals
    ]
    if right_on_as:
        out_cols.append(F.col("__match.__r_on").alias(right_on_as))
    return matched.select(*out_cols)


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
) -> DataFrame:
    """merge_asof-based variant (supports tolerance). Cogroups both sides
    by ``by`` keys and runs pandas.merge_asof per group (Arrow-batched)."""
    import pandas as pd

    by = by or []
    if not by:
        raise ValueError("asof_join_pandas requires at least one 'by' key")
    left_cols = list(left.columns)
    right_vals = [c for c in right.columns if c != on and c not in by]
    renamed = {c: (c + suffix if c in left_cols else c) for c in right_vals}

    out_schema = left.schema
    right_schema = right.schema
    from pyspark.sql import types as T

    fields = list(out_schema.fields)
    for c in right_vals:
        f = right_schema[c]
        fields.append(T.StructField(renamed[c], f.dataType, True))
    result_schema = T.StructType(fields)

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=[f.name for f in fields])
        l = l.sort_values(on)
        r = r.sort_values(on)[[on, *by, *right_vals]].rename(columns=renamed)
        merged = pd.merge_asof(
            l, r, on=on, by=by, direction=direction, tolerance=tolerance,
            suffixes=("", suffix),
        )
        return merged[[f.name for f in fields]]

    return (
        left.groupBy(*by)
        .cogroup(right.groupBy(*by))
        .applyInPandas(merge, schema=result_schema)
    )

"""Deterministic dataset splitting (train/val/test) for training-data
pipelines.

A training corpus must be split *stably*: re-running the pipeline after
adding data may not move an existing document between splits (that leaks
eval data into training). Random `df.randomSplit` fails this — it
depends on partitioning and seed plumbing. The standard fix (used by
every large-scale corpus pipeline) is hashing a stable key: bucket =
``int(md5(key || salt)[:6], 16) % buckets``, with split boundaries at
cumulative weight offsets. Assignment is then a pure narrow projection —
no shuffle, no state, embarrassingly parallel at 100 TB, and portable
(any engine with md5 computes the identical split; the DuckDB oracle
gate runs the same formula).

``salt`` rotates the assignment wholesale (e.g. per experiment) while
keeping it deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def split_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, BUCKETS) from a key column: first 6 hex chars
    of md5 → integer → modulo. JVM-side (md5/conv are built-ins), no UDF."""
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 6), 16, 10).cast("bigint") % BUCKETS)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add ``split_col`` assigning each row to a named split with
    probability proportional to ``weights`` (normalized). Deterministic
    in ``(key, salt)`` — stable under re-runs, appends, repartitioning,
    and engine choice."""
    if not weights:
        raise ValueError("weights must name at least one split")
    total = float(sum(weights.values()))
    bucket = split_bucket(F.col(key_col), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total * BUCKETS
        cond = bucket < int(round(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return df.withColumn(
        split_col, last if expr is None else expr.otherwise(names[-1])
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic ``fraction`` sample: keep rows whose hash bucket
    falls below the threshold. Unlike ``df.sample`` this is stable under
    re-runs/appends (a kept row stays kept) and engine-portable — the
    properties corpus sampling needs."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(
        split_bucket(F.col(key_col), salt) < int(round(fraction * BUCKETS))
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy``'s contract, made
    stable): each stratum value gets its own keep-fraction; rows in
    unlisted strata are dropped. Pure narrow filter — the per-stratum
    threshold rides in a literal map, so no join and no shuffle."""
    pairs: list = []
    for value, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0,1]")
        pairs.extend([F.lit(value), F.lit(int(round(frac * BUCKETS)))])
    thresholds = F.create_map(*pairs)
    limit = thresholds[F.col(strata_col)]
    return df.filter(
        limit.isNotNull()
        & (split_bucket(F.col(key_col), salt) < limit)
    )


def split_datasets(
    df: DataFrame, key_col: str, weights: dict[str, float], salt: str = ""
) -> dict[str, DataFrame]:
    """Materialize one DataFrame per split (filters over the same scan —
    Catalyst pushes the bucket predicate down to each branch)."""
    tagged = hash_split(df, key_col, weights, salt)
    return {
        name: tagged.filter(F.col("split") == name).drop("split")
        for name in weights
    }

"""exact_quantiles must equal Spark's exact `percentile` aggregate
(which itself matched DuckDB quantile_cont, round 4-6) on every shape,
while never buffering a group's values in one aggregation buffer."""

import math

import pytest
from pyspark.sql import functions as F

from vscode_parquet_visualizer_spark.operators.quantiles import exact_quantiles

QS = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]


def _reference(spark, df, keys, col, qs):
    agg = df.groupBy(*keys).agg(
        *[
            F.expr(f"percentile({col}, {q})").alias(f"p{i}")
            for i, q in enumerate(qs)
        ]
    )
    out = {}
    for r in agg.collect():
        out[tuple(r[k] for k in keys)] = [r[f"p{i}"] for i in range(len(qs))]
    return out


def _check(spark, df, keys, col, qs=QS, **kw):
    got = exact_quantiles(df, keys, col, qs, **kw)
    want = _reference(spark, df, keys, col, qs)
    assert len(got) == len(want)
    for row in got:
        key = tuple(row[k] for k in keys)
        for q, expect in zip(qs, want[key]):
            assert row[q] == pytest.approx(expect, rel=1e-12, abs=1e-12), (
                key, q, row[q], expect,
            )


def test_orders_matches_percentile(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    _check(spark, df, ["o_orderstatus"], "o_totalprice")


def test_forced_refinement_path(spark, sf_dir):
    # candidate_limit=8 forces the histogram-refinement loop to actually
    # iterate (the sf0.001 fast path would otherwise collect directly)
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    _check(
        spark, df, ["o_orderstatus"], "o_totalprice",
        buckets=16, candidate_limit=8,
    )


def test_heavy_ties_resolve_without_collection(spark):
    # one dominant duplicated value per group: the bin min==max fast
    # path must resolve it exactly even with candidate_limit=1
    rows = [("a", 5.0)] * 500 + [("a", float(i)) for i in range(10)]
    rows += [("b", -3.5)] * 300 + [("b", 99.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    _check(spark, df, ["g"], "v", buckets=8, candidate_limit=1)


def test_tiny_groups_and_constant_group(spark):
    rows = [("one", 42.0), ("two", 1.0), ("two", 2.0), ("const", 7.0),
            ("const", 7.0), ("const", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    _check(spark, df, ["g"], "v")


def test_nulls_ignored_and_multi_key(spark):
    rows = [(1, "x", None), (1, "x", 3.0), (1, "x", 1.0), (1, "y", 9.0),
            (2, "x", None), (2, "x", 4.0)]
    df = spark.createDataFrame(rows, "a int, g string, v double")
    _check(spark, df, ["a", "g"], "v", qs=[0.5, 1.0])


def test_interpolation_formula():
    # parity pin: pos = q*(n-1), lo + frac*(hi-lo) — the exact formula
    # Spark percentile and DuckDB quantile_cont share
    n, q = 7, 0.9
    p = q * (n - 1)
    assert math.floor(p) == 5 and math.ceil(p) == 6


def test_bounds_hint_skips_stats_scan(spark, sf_dir):
    # global footer-stats bounds: same answers, one fewer scan
    from vscode_parquet_visualizer_spark.functions.metadata import (
        parquet_column_bounds,
    )
    b = parquet_column_bounds(f"{sf_dir}/orders.parquet", "o_totalprice")
    assert b is not None and float(b[0]) < float(b[1])
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = exact_quantiles(
        df, ["o_orderstatus"], "o_totalprice", QS,
        bounds=(float(b[0]), float(b[1])),
    )
    want = _reference(spark, df, ["o_orderstatus"], "o_totalprice", QS)
    for row in got:
        for q, expect in zip(QS, want[(row["o_orderstatus"],)]):
            assert row[q] == pytest.approx(expect, rel=1e-12, abs=1e-12)


def test_join_fallback_path(spark, sf_dir):
    # force the broadcast-join path by dropping the expression cap
    import vscode_parquet_visualizer_spark.operators.quantiles as qmod
    old = qmod._EXPR_INTERVALS
    qmod._EXPR_INTERVALS = 0
    try:
        df = spark.read.parquet(f"{sf_dir}/orders.parquet")
        _check(spark, df, ["o_orderstatus"], "o_totalprice",
               qs=[0.5, 0.9], buckets=16, candidate_limit=8)
    finally:
        qmod._EXPR_INTERVALS = old

"""Distributed-rank operator (operators/rank.py): global row numbers
must equal Spark's own window row_number() on identical total orders,
for any partitioning the range shuffle picks."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vscode_parquet_visualizer_spark.operators.rank import (
    ntile_from_rn,
    with_row_numbers,
)


@pytest.fixture(scope="module")
def data(spark):
    return spark.range(1000).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 37 % 1000).alias("v"),
        F.col("id").alias("uid"),
    )


def test_row_numbers_match_window(spark, data):
    r = with_row_numbers(
        data, ["g"], [F.col("v").desc(), F.col("uid")], num_partitions=8
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("uid"))
    want = data.withColumn("rn", F.row_number().over(w))
    got = {(x["g"], x["uid"]): x["__rn"] for x in r.collect()}
    for x in want.collect():
        assert got[(x["g"], x["uid"])] == x["rn"]


def test_partition_counts(spark, data):
    r = with_row_numbers(data, ["g"], [F.col("uid")], num_partitions=4)
    counts = {x["g"]: x["__pn"] for x in r.collect()}
    want = {x["g"]: x["n"] for x in data.groupBy("g").agg(
        F.count("*").alias("n")).collect()}
    assert counts == want


def test_null_partition_key(spark):
    df = spark.range(20).select(
        F.when(F.col("id") % 3 == 0, None).otherwise(
            F.col("id") % 3
        ).alias("g"),
        F.col("id").alias("uid"),
    )
    r = with_row_numbers(df, ["g"], [F.col("uid")], num_partitions=3)
    rows = r.collect()
    by_g = {}
    for x in rows:
        by_g.setdefault(x["g"], []).append(x["__rn"])
    for g, rns in by_g.items():
        assert sorted(rns) == list(range(1, len(rns) + 1)), (g, rns)


def test_ntile_matches_spark(spark, data):
    w = Window.partitionBy("g").orderBy("uid")
    want = data.select(
        "g", "uid",
        F.ntile(4).over(w).alias("nt"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("g")).alias("n"),
    )
    got = want.withColumn(
        "nt2", ntile_from_rn(F.col("rn"), F.col("n"), 4)
    )
    bad = got.filter(F.col("nt") != F.col("nt2")).count()
    assert bad == 0


def test_empty_input(spark):
    df = spark.range(0).select(
        F.col("id").alias("g"), F.col("id").alias("uid")
    )
    r = with_row_numbers(df, ["g"], [F.col("uid")])
    assert r.count() == 0


def test_nonstring_partition_keys(spark):
    """Round-12 ADVICE: the stats lookup key must be the ENGINE's string
    rendering, not Python str() — str(True)='True' vs Spark 'true' and
    str(1e-07)='1e-07' vs Spark '1.0E-7' made rn/n silently NULL for
    boolean/float partition columns."""
    df = spark.range(40).select(
        (F.col("id") % 2 == 0).alias("b"),
        F.when(F.col("id") % 4 == 0, F.lit(1e-07))
        .otherwise(F.lit(2.5))
        .alias("f"),
        F.col("id").alias("uid"),
    )
    r = with_row_numbers(df, ["b", "f"], [F.col("uid")], num_partitions=3)
    rows = r.collect()
    assert all(x["__rn"] is not None and x["__pn"] is not None for x in rows)
    w = Window.partitionBy("b", "f").orderBy("uid")
    want = {
        (x["b"], x["f"], x["uid"]): x["rn"]
        for x in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    for x in rows:
        assert want[(x["b"], x["f"], x["uid"])] == x["__rn"]


def test_broadcast_fixup_path(spark, data, monkeypatch):
    """Round-11 verdict item 8: above _MAP_LITERAL_MAX stats groups the
    fix-up must attach via a broadcast join on the tiny stats DataFrame
    (a create_map literal of 10⁵ tasks × partitions entries is itself a
    driver bottleneck at cluster scale). Force the threshold to 0 and pin
    both the values and the broadcast-join plan shape."""
    import vscode_parquet_visualizer_spark.operators.rank as rank_mod

    monkeypatch.setattr(rank_mod, "_MAP_LITERAL_MAX", 0)
    r = with_row_numbers(
        data, ["g"], [F.col("v").desc(), F.col("uid")], num_partitions=8
    )
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("uid"))
    want = data.withColumn("rn", F.row_number().over(w))
    got = {(x["g"], x["uid"]): (x["__rn"], x["__pn"]) for x in r.collect()}
    totals = {
        x["g"]: x["n"]
        for x in data.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    for x in want.collect():
        assert got[(x["g"], x["uid"])] == (x["rn"], totals[x["g"]])


def test_percent_rank_single_row_partition(spark):
    """percent_rank() is 0 for a single-row partition; the naive
    (rn-1)/(n-1) is 0/0 → NULL in non-ANSI Spark (round-12 ADVICE)."""
    from vscode_parquet_visualizer_spark.operators.rank import (
        percent_rank_from_rn,
    )

    df = spark.createDataFrame(
        [("a", 1), ("b", 1), ("b", 2), ("b", 3)], "g string, uid int"
    )
    r = with_row_numbers(df, ["g"], [F.col("uid")], num_partitions=2)
    out = {
        (x["g"], x["uid"]): x["pr"]
        for x in r.withColumn(
            "pr", percent_rank_from_rn(F.col("__rn"), F.col("__pn"))
        ).collect()
    }
    assert out[("a", 1)] == 0.0
    assert out[("b", 1)] == 0.0 and out[("b", 3)] == 1.0


def test_q59_distributed_full_composition(spark, monkeypatch):
    """Round-11 verdict item 2: the q59 branch that runs at 100 TB must
    be the branch the gates see. Force SPARK_GRAFT_RANK=distributed at
    driver-gate scale and pin the FULL composition (rank/dense_rank from
    the total-order row number, percent_rank fold with rounding, ntile
    fold, first/nth_value broadcast attach) row-equal to the plain
    window oracle."""
    from vscode_parquet_visualizer_spark import workload

    sf_dir = "/root/testdata/sf0.01"
    monkeypatch.setenv("SPARK_GRAFT_RANK", "window")
    want = sorted(
        tuple(r)
        for r in workload.QUERIES["q59_rank_functions"](spark, sf_dir)
        .collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_RANK", "distributed")
    got_df = workload.QUERIES["q59_rank_functions"](spark, sf_dir)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "forced-distributed q59 must not use WindowExec"
    got = sorted(tuple(r) for r in got_df.collect())
    assert len(got) == len(want) and got == want

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

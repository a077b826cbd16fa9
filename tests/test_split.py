"""Deterministic hash split (operators/split.py)."""

from pyspark.sql import functions as F

from vscode_parquet_visualizer_spark.operators.split import (
    hash_split,
    split_datasets,
)


def test_split_deterministic_under_repartition(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id", w).select("doc_id", "split").collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(13), "doc_id", w)
        .select("doc_id", "split")
        .collect()
    }
    assert a == b


def test_split_proportions_and_totality(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    counts = {
        r["split"]: r["n"]
        for r in hash_split(docs, "doc_id", w)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(counts.values()) == n
    assert abs(counts["train"] / n - 0.8) < 0.1


def test_salt_rotates_assignment(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = {"a": 0.5, "b": 0.5}
    s0 = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id", w).select("doc_id", "split").collect()
    }
    s1 = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id", w, salt="exp2")
        .select("doc_id", "split")
        .collect()
    }
    assert s0 != s1  # some documents must move
    assert set(s0) == set(s1)  # same universe


def test_split_datasets_partition_the_input(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = split_datasets(docs, "doc_id", {"train": 0.9, "test": 0.1})
    assert set(parts) == {"train", "test"}
    assert parts["train"].count() + parts["test"].count() == docs.count()
    assert "split" not in parts["train"].columns


def test_split_no_shuffle_in_plan(spark, sf_dir):
    """Assignment is a narrow projection: no Exchange before the scan's
    project (the 100 TB contract)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tagged = hash_split(docs, "doc_id", {"train": 0.9, "test": 0.1})
    plan = tagged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchScan" in plan or "FileScan" in plan or "Scan parquet" in plan

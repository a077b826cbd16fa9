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


def test_hash_sample_stable_subset(spark, sf_dir):
    from vscode_parquet_visualizer_spark.operators.split import hash_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half = hash_sample(docs, "doc_id", 0.5)
    ids_a = {r["doc_id"] for r in half.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in hash_sample(docs.repartition(7), "doc_id", 0.5).select("doc_id").collect()}
    assert ids_a == ids_b
    # monotone: a smaller fraction is a subset of a larger one
    ids_small = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    assert ids_small <= ids_a


def test_stratified_hash_sample_drops_unlisted(spark, sf_dir):
    from vscode_parquet_visualizer_spark.operators.split import (
        stratified_hash_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 1.0, "de": 0.0}
    )
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    n_en = docs.filter("lang = 'en'").count()
    assert out.count() == n_en  # fraction 1.0 keeps every row


def test_pack_sequences_budget_bound(spark, sf_dir):
    from vscode_parquet_visualizer_spark.operators.packing import (
        pack_manifest,
        pack_sequences,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    budget = 20000
    packed = pack_sequences(docs, "n_chars", budget, "doc_id", ["lang"])
    # every doc assigned; packs contiguous from 0 per group
    assert packed.filter("pack_id IS NULL").count() == 0
    man = pack_manifest(docs, "n_chars", budget, "doc_id", ["lang"]).collect()
    by_lang = {}
    for r in man:
        by_lang.setdefault(r["lang"], []).append(r["pack_id"])
    for lang, ids in by_lang.items():
        assert sorted(ids) == list(range(len(ids))), lang
    # streaming-packing bound: a pack exceeds budget by at most one doc —
    # equivalently, the pack minus its last (largest-index) doc fits
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    w = Window.partitionBy("lang", "pack_id").orderBy(F.desc("doc_id"))
    trimmed = (
        packed.withColumn("rn", F.row_number().over(w))
        .filter("rn > 1")
        .groupBy("lang", "pack_id")
        .agg(F.sum("n_chars").alias("rest"))
    )
    assert trimmed.filter(F.col("rest") >= budget).count() == 0

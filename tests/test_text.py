"""Text analysis operators: token counts, ratios, lang-id, fingerprint."""

import pytest
from pyspark.sql import functions as F

from vscode_parquet_visualizer_spark.operators import text as tx


def one(spark, text, col):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(col.alias("v")).first()["v"]


def test_token_count(spark):
    assert one(spark, "a b  c", tx.token_count(F.col("text"))) == 3
    assert one(spark, "", tx.token_count(F.col("text"))) == 0
    assert one(spark, "   ", tx.token_count(F.col("text"))) == 0
    assert one(spark, "single", tx.token_count(F.col("text"))) == 1


def test_punct_ratio(spark):
    assert one(spark, "ab.,", tx.punct_ratio(F.col("text"))) == 0.5
    assert one(spark, "", tx.punct_ratio(F.col("text"))) == 0.0


def test_digit_uppercase_ratio(spark):
    assert one(spark, "a1B2", tx.digit_ratio(F.col("text"))) == 0.5
    assert one(spark, "aB", tx.uppercase_ratio(F.col("text"))) == 0.5


def test_mean_word_length(spark):
    assert one(spark, "ab cdef", tx.mean_word_length(F.col("text"))) == 3.0
    assert one(spark, "", tx.mean_word_length(F.col("text"))) == 0.0


def test_lang_id(spark):
    assert one(spark, "the cat and the dog is here", tx.lang_id(F.col("text"))) == "en"
    assert one(spark, "der hund und die katze", tx.lang_id(F.col("text"))) == "de"
    assert one(spark, "le chat et la souris", tx.lang_id(F.col("text"))) == "fr"
    assert one(spark, "el gato que los perros", tx.lang_id(F.col("text"))) == "es"
    assert one(spark, "xyzzy plugh 42", tx.lang_id(F.col("text"))) == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("other",)], ["text"]
    )
    vals = [r["f"] for r in df.select(tx.fingerprint(F.col("text")).alias("f")).collect()]
    assert vals[0] == vals[1]
    assert vals[0] != vals[2]


def test_quality_score_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = docs.select(tx.quality_score(F.col("text")).alias("q"))
    row = stats.agg(F.min("q").alias("lo"), F.max("q").alias("hi")).first()
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0


def test_with_text_stats_columns(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    out = tx.with_text_stats(docs)
    for c in ["n_tokens", "quality", "lang_pred", "fingerprint"]:
        assert c in out.columns
    assert out.count() == 10


def test_token_count_bpe(spark):
    vals = {
        "hello world": 2,
        "don't stop": 4,          # don + ' + t + stop
        "abc123 x-y": 5,          # abc, 123, x, -, y
        "": 0,
        "  ": 0,
    }
    for text, want in vals.items():
        got = one(spark, text, tx.token_count_bpe(F.col("text")))
        assert got == want, (text, got, want)

"""Unit tests for operators/curation.py (repetition filters, PII
redaction, decontamination, chunking, weighted mixing). The end-to-end
oracle gates live in workload qa0-qa4 / q78_curation_suite."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from vscode_parquet_visualizer_spark.operators import curation as cu
from vscode_parquet_visualizer_spark.operators.split import BUCKETS, split_bucket


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --------------------------------------------------------------------- rep


def test_repetition_metrics_values(spark):
    df = _docs(
        spark,
        [
            (1, "a b a a c"),  # top token 'a' x3 of 5; bigrams: a b, b a, a a
            (2, ""),  # empty: all zeros, kept
            (3, "x x x x"),  # degenerate: dup .75, top 1.0 -> dropped
            (4, "one two three four five six seven eight nine ten"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in cu.with_repetition_metrics(df).collect()
    }
    assert out[1]["dup_token_frac"] == pytest.approx(1 - 3 / 5)
    assert out[1]["top_token_frac"] == pytest.approx(3 / 5)
    assert out[1]["top_bigram_frac"] == pytest.approx(1 / 4)
    assert out[2]["dup_token_frac"] == 0.0 and out[2]["keep_repetition"]
    assert out[3]["top_token_frac"] == 1.0 and not out[3]["keep_repetition"]
    assert out[4]["dup_token_frac"] == 0.0 and out[4]["keep_repetition"]


def test_max_group_count_matches_python_counter(spark):
    words = "the quick the lazy dog the quick end".split()
    got = (
        spark.range(1)
        .select(cu._max_group_count(F.lit(words).cast("array<string>")))
        .first()[0]
    )
    assert got == max(Counter(words).values())


def test_symbol_ratio(spark):
    df = _docs(spark, [(1, "ab!@ cd")])
    r = df.select(cu.symbol_ratio(F.col("text")).alias("s")).first()["s"]
    assert r == pytest.approx(2 / 7)


# --------------------------------------------------------------------- pii


def test_pii_redaction_and_counts(spark):
    text = (
        "mail bob.smith+x@corp.example.org or ann@a.io, "
        "call 555-1234 or 123.456, server 192.168.0.1 done"
    )
    df = _docs(spark, [(1, text)])
    counts = cu.pii_counts(F.col("text"))
    row = df.select(
        cu.redact_pii(F.col("text")).alias("red"),
        counts["n_email"].alias("e"),
        counts["n_ip"].alias("i"),
        counts["n_phone"].alias("p"),
    ).first()
    assert row["e"] == 2 and row["i"] == 1 and row["p"] == 2
    assert "<EMAIL>" in row["red"] and "<IP>" in row["red"]
    assert "bob.smith" not in row["red"] and "192.168" not in row["red"]
    assert row["red"].count("<PHONE>") == 2


def test_pii_no_double_count_ip_inside_email(spark):
    # the host part of a planted email looks IP-ish; email wins, the IP
    # counter (taken after email redaction) must not also claim it
    df = _docs(spark, [(1, "x u@10.0.0.1.example.com y")])
    counts = cu.pii_counts(F.col("text"))
    row = df.select(counts["n_email"].alias("e"), counts["n_ip"].alias("i")).first()
    assert row["e"] == 1 and row["i"] == 0


# ------------------------------------------------------------------- decon


def test_decontaminate_planted_overlap(spark):
    ev = _docs(spark, [(100, "alpha beta gamma delta")])
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),  # shares 2 of 3 shingles
            (2, "zeta eta theta iota kappa"),  # disjoint
            (3, "xy"),  # < 3 tokens: no shingles, omitted
        ],
    )
    out = {r["doc_id"]: r for r in cu.decontaminate(train, ev).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_shingles"] == 3 and out[1]["n_overlap"] == 2
    assert out[1]["contaminated"]
    assert out[2]["n_overlap"] == 0 and not out[2]["contaminated"]
    assert out[2]["contamination"] == 0.0


# ------------------------------------------------------------------- chunk


def test_chunking_bounds_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(90))  # 90 tokens
    df = _docs(spark, [(1, text), (2, "solo"), (3, "")])
    rows = cu.chunk_documents(df, chunk_tokens=50, stride=40).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 90 tokens, 50/40 -> chunks [0..49], [40..89]
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_id"] for r in c1] == [0, 1]
    assert c1[0]["n_chunk_tokens"] == 50 and c1[1]["n_chunk_tokens"] == 50
    assert c1[0]["chunk_text"].split()[:2] == ["t0", "t1"]
    assert c1[1]["chunk_text"].split()[0] == "t40"
    assert c1[1]["chunk_text"].split()[-1] == "t89"
    # short doc: one chunk, whole text; empty doc: no chunks
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "solo"
    assert 3 not in by_doc


def test_chunking_exact_multiple_boundary(spark):
    # n=120, chunk=50, stride=40 -> ceil(70/40)+1 = 3 chunks (last partial)
    df = _docs(spark, [(1, " ".join(f"t{i}" for i in range(120)))])
    rows = cu.chunk_documents(df, chunk_tokens=50, stride=40).collect()
    assert sorted(r["chunk_id"] for r in rows) == [0, 1, 2]
    last = max(rows, key=lambda r: r["chunk_id"])
    assert last["n_chunk_tokens"] == 40  # tokens 80..119


def test_chunking_rejects_bad_args(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        cu.chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        cu.chunk_documents(df, stride=-1)


# --------------------------------------------------------------------- mix


def test_weighted_mix_copy_counts(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(200)],
        "doc_id long, source string",
    )
    out = cu.weighted_mix(df, "doc_id", "source", {"a": 2.0, "b": 0.5})
    counts = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # every 'a' row appears exactly twice
    assert all(counts[i] == 2 for i in range(0, 200, 2))
    # 'b' rows appear 0 or 1 times, matching the deterministic bucket
    kept_b = {i for i in counts if i % 2 == 1}
    expect_b = {
        r["doc_id"]
        for r in df.filter("source = 'b'")
        .filter(split_bucket(F.col("doc_id"), "mix") < int(0.5 * BUCKETS))
        .collect()
    }
    assert kept_b == expect_b
    assert all(counts[i] == 1 for i in kept_b)
    # roughly half of 'b' kept
    assert 0.3 < len(kept_b) / 100 < 0.7


def test_weighted_mix_drops_unlisted_and_zero(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "zero"), (3, "unlisted")], "doc_id long, source string"
    )
    out = cu.weighted_mix(df, "doc_id", "source", {"a": 1.0, "zero": 0.0})
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_weighted_mix_rejects_negative(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        cu.weighted_mix(df, "doc_id", "source", {"a": -1.0})


def test_weighted_mix_deterministic_rerun(spark):
    df = spark.createDataFrame(
        [(i, "s") for i in range(50)], "doc_id long, source string"
    )
    a = sorted(
        (r["doc_id"], r["copy_id"])
        for r in cu.weighted_mix(df, "doc_id", "source", {"s": 1.3}).collect()
    )
    b = sorted(
        (r["doc_id"], r["copy_id"])
        for r in cu.weighted_mix(
            df.repartition(7), "doc_id", "source", {"s": 1.3}
        ).collect()
    )
    assert a == b and len(a) >= 50


# ------------------------------------------------------------------- plans


def test_narrow_ops_have_no_shuffle(spark):
    """Repetition metrics, redaction, chunking, and mixing are narrow
    projections: their physical plans must contain no Exchange."""
    df = _docs(spark, [(1, "a b c d e")])
    for frame in (
        cu.with_repetition_metrics(df),
        df.select(cu.redact_pii(F.col("text"))),
        cu.chunk_documents(df),
        cu.weighted_mix(
            df.withColumn("source", F.lit("s")), "doc_id", "source", {"s": 1.5}
        ),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------- lm


def test_lm_perplexity_orders_common_before_rare(spark):
    # "a b" appears in many docs; doc 4's bigrams are unique — the
    # corpus-LM must score the common doc as more probable (lower nll)
    docs = _docs(
        spark,
        [
            (1, "a b a b a b"),
            (2, "a b a b"),
            (3, "a b"),
            (4, "q r s t u v"),
        ],
    )
    out = {r["doc_id"]: r for r in cu.lm_perplexity(docs).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["avg_nll"] < out[4]["avg_nll"]
    assert out[3]["n_bigrams"] == 1
    # short/empty docs carry no bigram evidence
    short = _docs(spark, [(9, "solo"), (10, "")])
    assert cu.lm_perplexity(short).count() == 0


# ----------------------------------------------------------------- stream


def test_curation_ops_compose_with_streaming(spark, tmp_path):
    """The narrow curation projections (redaction, repetition metrics,
    chunking) are stateless — they run unchanged on a readStream source,
    which is how a 100 TB ingest would apply them on arrival."""
    src = str(tmp_path / "docs_stream")
    spark.createDataFrame(
        [(1, "contact a@b.com now now now"), (2, "many distinct clean words flowing along nicely here today")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = cu.with_repetition_metrics(
        stream.select("doc_id", cu.redact_pii(F.col("text")).alias("text"))
    )
    q = (
        out.writeStream.format("memory")
        .queryName("curation_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r["doc_id"]: r for r in spark.table("curation_stream").collect()}
    assert rows[1]["text"].startswith("contact <EMAIL>")
    assert rows[1]["top_token_frac"] > rows[2]["top_token_frac"]
    assert rows[2]["keep_repetition"]

"""Dedup operators: exact, minhash LSH, n-gram Jaccard, simhash."""

import pytest
from pyspark.sql import functions as F

from vscode_parquet_visualizer_spark.operators import dedup as dd

DOC = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill in the afternoon sun light"
)
NEAR_DOC = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill in the evening sun light"
)
OTHER = (
    "completely different content about distributed query engines and "
    "columnar storage formats for analytical workloads at scale"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, DOC),
        (1, DOC),                  # exact dup of 0
        (2, DOC.upper()),          # case-normalized dup of 0
        (3, NEAR_DOC),             # near-dup of 0
        (4, OTHER),
        (5, "  " + DOC + "  "),    # whitespace-normalized dup
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    out = {r["keep_id"]: r["dup_count"] for r in dd.exact_dedup(docs).collect()}
    assert out[0] == 4  # 0,1,2,5 collapse
    assert out[3] == 1
    assert out[4] == 1


def test_shingle_values(spark):
    df = spark.createDataFrame([("a b c d",)], ["text"])
    out = df.select(dd.shingles(F.col("text"), n=2).alias("sh")).first()["sh"]
    assert sorted(out) == ["a b", "b c", "c d"]


def test_shingle_short_doc(spark):
    df = spark.createDataFrame([("solo",)], ["text"])
    out = df.select(dd.shingles(F.col("text"), n=3).alias("sh")).first()["sh"]
    assert out == ["solo"]


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dd.minhash_lsh_pairs(docs, num_hashes=64, bands=16).collect()
    }
    # exact dups always collide; the near-dup pair should too (high jaccard)
    assert (0, 1) in pairs
    assert (0, 3) in pairs or (1, 3) in pairs
    # unrelated doc never pairs with the rest
    assert not any(4 in p for p in pairs)


def test_ngram_jaccard_values(docs):
    out = dd.ngram_jaccard_pairs(docs, shingle_n=2, threshold=0.5)
    vals = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert vals[(0, 1)] == 1.0
    pair_03 = vals.get((0, 3))
    assert pair_03 is not None and 0.7 < pair_03 < 1.0


def test_simhash_identical_distance_zero(docs):
    pairs = dd.simhash_dedup(docs).collect()
    ham = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert ham[(0, 1)] == 0
    if (0, 3) in ham:  # near dup: closer than random (~32 expected bits)
        assert ham[(0, 3)] <= 20


def test_simhash_column_deterministic(spark):
    df = spark.createDataFrame([(DOC,), (DOC,)], ["text"])
    vals = [r["h"] for r in df.select(dd.simhash(F.col("text")).alias("h")).collect()]
    assert vals[0] == vals[1]


def test_dup_clusters(spark):
    """Chain 1-2-3 plus pair (5,6) and isolated via pairs only: components
    resolve to min-id labels in O(diameter) label-propagation rounds."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (10, 11)],
        ["id_a", "id_b"],
    )
    out = {r["id"]: r["cluster_id"] for r in dd.dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8, 9: 8, 10: 8, 11: 8}


def test_dup_clusters_survivorship(docs):
    """End-to-end: LSH pairs -> clusters -> survivors (keep min id)."""
    pairs = dd.minhash_lsh_pairs(docs, num_hashes=64, bands=16)
    clusters = dd.dup_clusters(pairs)
    # doc ids 0,1,2,5 are dups of each other (cluster 0); 3 near-dup may join
    labels = {r["id"]: r["cluster_id"] for r in clusters.collect()}
    assert labels[1] == 0 and labels[2] == 0 and labels[5] == 0


def test_approx_distinct_tolerance(spark, sf_dir):
    from vscode_parquet_visualizer_spark import workload

    out = workload.QUERIES["q66_approx_distinct"](spark, sf_dir).collect()
    assert out
    for r in out:
        rel_err = abs(r["approx_parts"] - r["exact_parts"]) / max(1, r["exact_parts"])
        assert rel_err < 0.05, (r["l_returnflag"], rel_err)


def test_segment_dedup_first_occurrence(spark):
    from vscode_parquet_visualizer_spark.operators.dedup import segment_dedup

    boiler = "the quick brown fox jumps over the lazy dog again"  # 10 words
    docs = spark.createDataFrame(
        [
            (1, boiler + " unique one two three four five six seven eight nine"),
            (2, boiler + " totally different tail words here padding out ten words"),
            (3, "no shared segments in this document at all ok fine"),
        ],
        "doc_id LONG, text STRING",
    )
    out = segment_dedup(docs, words_per_segment=10).collect()
    by_key = {(r["id"], r["seg_idx"]): r for r in out}
    # doc1 seg0 is the first occurrence of the boilerplate -> kept
    assert by_key[(1, 0)]["keep"] is True
    # doc2 seg0 is the same segment, later doc -> dropped
    assert by_key[(2, 0)]["segment"] == boiler
    assert by_key[(2, 0)]["keep"] is False
    # non-shared segments all kept
    assert by_key[(1, 1)]["keep"] and by_key[(2, 1)]["keep"] and by_key[(3, 0)]["keep"]


def test_segment_dedup_hashed_key_matches_exact(spark, sf_dir):
    """The 100 TB hashed-shuffle variant (key='hash') must agree row-for-row
    with the exact text-keyed plan, and its window exchange must NOT carry
    the segment strings (the whole point: 16-byte fingerprint payloads)."""
    from vscode_parquet_visualizer_spark.operators.dedup import segment_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        (r["id"], r["seg_idx"]): r["keep"]
        for r in segment_dedup(docs, key="segment").collect()
    }
    hashed_df = segment_dedup(docs, key="hash")
    assert set(hashed_df.columns) == {"id", "seg_idx", "keep"}
    hashed = {
        (r["id"], r["seg_idx"]): r["keep"] for r in hashed_df.collect()
    }
    assert hashed == exact
    # the exchange feeding the window ships hashes, not strings: no
    # 'segment' column survives past the pre-shuffle projection
    plan = hashed_df._jdf.queryExecution().executedPlan().toString()
    exchange_and_after = plan[: plan.find("Exchange")]
    assert "Exchange" in plan
    assert "segment" not in exchange_and_after


def test_segment_dedup_auto_switches_on_size(spark, sf_dir, tmp_path):
    from vscode_parquet_visualizer_spark.operators import dedup as dd

    # RDD-backed local relation: Catalyst reports the Long.MaxValue "no
    # estimate" sentinel -> auto must keep the full-contract text key
    local = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id LONG, text STRING"
    )
    assert "segment" in dd.segment_dedup(local, key="auto").columns
    # file scan carries real stats: tiny input -> text key, and with the
    # threshold forced to zero the same input -> hashed key
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert "segment" in dd.segment_dedup(docs, key="auto").columns
    orig = dd._SEGMENT_HASH_THRESHOLD_BYTES
    dd._SEGMENT_HASH_THRESHOLD_BYTES = -1
    try:
        assert "segment" not in dd.segment_dedup(docs, key="auto").columns
    finally:
        dd._SEGMENT_HASH_THRESHOLD_BYTES = orig

"""Scale operators: salted join/aggregate correctness, bucketed joins
actually eliminating the shuffle."""

import pytest
from pyspark.sql import functions as F

from vscode_parquet_visualizer_spark.operators import scale


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows of one hot key + a tail
    hot = spark.range(10000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    tail = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


@pytest.fixture(scope="module")
def dim(spark):
    rows = [("hot", "HOT")] + [(f"k{i}", f"D{i}") for i in range(100)]
    return spark.createDataFrame(rows, ["k", "label"])


def test_salted_join_matches_plain_join(skewed, dim):
    plain = skewed.join(dim, "k").groupBy("label").count()
    salted = scale.salted_join(skewed, dim, "k").groupBy("label").count()
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_left(skewed, dim, spark):
    extra = skewed.unionByName(
        spark.createDataFrame([("orphan", 1)], ["k", "v"])
    )
    out = scale.salted_join(extra, dim, "k", how="left")
    assert out.filter(F.col("k") == "orphan").first()["label"] is None
    assert out.count() == extra.count()


def test_salted_aggregate_matches_plain(skewed):
    plain = {
        r["k"]: (r["s"], r["n"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"))
        .collect()
    }
    salted = {
        r["k"]: (r["sum_v"], r["count_v"])
        for r in scale.salted_aggregate(
            skewed, ["k"], {"v": "sum"} | {}, salts=8
        )
        .join(
            scale.salted_aggregate(skewed, ["k"], {"v": "count"}, salts=8), "k"
        )
        .collect()
    }
    assert plain == salted


def test_salted_aggregate_rejects_avg(skewed):
    with pytest.raises(ValueError, match="non-associative"):
        scale.salted_aggregate(skewed, ["k"], {"v": "avg"})


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/tmp/spark-warehouse-tests/{t}", ignore_errors=True)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    scale.write_bucketed(
        orders.withColumnRenamed("o_orderkey", "key"), "b_orders", "key", 8
    )
    scale.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "key"), "b_lineitem", "key", 8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = scale.colocated_join(spark, "b_orders", "b_lineitem", "key")
        assert not scale.has_exchange(joined)
        # same join on raw (unbucketed) frames must shuffle both sides
        raw = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        assert scale.has_exchange(raw)
        assert joined.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_range_join_matches_naive(spark):
    from vscode_parquet_visualizer_spark.operators.range_join import range_join

    pts = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(50)], ["pid", "t"]
    )
    ivs = spark.createDataFrame(
        [(0, 5, 20), (1, 18, 42), (2, 90, 99), (3, 42, 42)],
        ["iid", "lo", "hi"],
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(pts, ivs, "t", "lo", "hi", bucket_width=10).collect()
    }
    want = {
        (r["pid"], r["iid"])
        for r in pts.crossJoin(ivs)
        .filter("t BETWEEN lo AND hi")
        .collect()
    }
    assert got == want and len(want) > 0


def test_range_join_left_keeps_unmatched_points(spark):
    from vscode_parquet_visualizer_spark.operators.range_join import range_join

    pts = spark.createDataFrame(
        [(0, 10), (1, 30), (2, 95)], ["pid", "t"]
    )
    # pid=1 (t=30): its bucket overlaps the (5,20)-interval's exploded
    # buckets? no — pick an interval set where a point's bucket matches
    # interval rows but the BETWEEN fails: t=30 shares bucket 3 with
    # hi=35's explosion while 30 NOT BETWEEN 31 AND 35.
    ivs = spark.createDataFrame(
        [(0, 5, 12), (1, 31, 35)], ["iid", "lo", "hi"]
    )
    out = range_join(pts, ivs, "t", "lo", "hi", bucket_width=10, how="left")
    rows = {(r["pid"], r["iid"]) for r in out.collect()}
    # matched: pid0→iid0; unmatched pid1 and pid2 survive with null iid
    assert rows == {(0, 0), (1, None), (2, None)}
    import pytest

    with pytest.raises(ValueError):
        range_join(pts, ivs, "t", "lo", "hi", bucket_width=10, how="full")


def test_hypertable_rollup_resolutions(spark, sf_dir):
    from pyspark.sql import functions as F

    from vscode_parquet_visualizer_spark.operators.range_join import (
        hypertable_rollup,
    )
    from vscode_parquet_visualizer_spark.sources import registry

    ev = registry.read(spark, f"{sf_dir}/events.parquet", "parquet")
    out = hypertable_rollup(
        ev, "ts", [3600, 86400], ["event_type"],
        [F.count(F.lit(1)).alias("n")],
    )
    day = out.filter(F.col("width") == 86400)
    hour = out.filter(F.col("width") == 3600)
    # hour buckets must sum to the day totals
    tot_day = day.agg(F.sum("n")).first()[0]
    tot_hour = hour.agg(F.sum("n")).first()[0]
    assert tot_day == tot_hour == ev.count()


def test_zorder_layout_clusters_both_columns(spark, tmp_path):
    """After z-ordering on (a, b) and splitting into files, per-file
    min/max ranges of BOTH columns must be much narrower than the global
    range (the property row-group pruning exploits)."""
    import random

    rnd = random.Random(3)
    rows = [(rnd.randrange(10**6), rnd.randrange(10**6)) for _ in range(20000)]
    df = spark.createDataFrame(rows, ["a", "b"])
    z = scale.zorder_layout(df, ["a", "b"], bits=10, partitions=8)
    out = str(tmp_path / "zorder")
    z.write.mode("overwrite").parquet(out)

    import pyarrow.parquet as pq
    import os

    spans_a, spans_b = [], []
    for fname in os.listdir(out):
        if not fname.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(out, fname))
        if t.num_rows == 0:
            continue
        a = t["a"].to_pylist(); b = t["b"].to_pylist()
        spans_a.append(max(a) - min(a)); spans_b.append(max(b) - min(b))
    assert len(spans_a) >= 4
    # typical files cover a fraction of the domain on BOTH dimensions;
    # median, not mean — a file straddling a major curve-quadrant boundary
    # legitimately spans wide, and range-partition sampling jitter can put
    # one such file in any run (mean 0.58-0.61 observed for identical code)
    import statistics

    assert statistics.median(spans_a) < 10**6 * 0.6
    assert statistics.median(spans_b) < 10**6 * 0.6
    assert sum(spans_a) / len(spans_a) < 10**6 * 0.85
    assert sum(spans_b) / len(spans_b) < 10**6 * 0.85
    assert z.count() == 20000  # no rows lost


def test_profile(spark, sf_dir):
    from vscode_parquet_visualizer_spark.engine import Engine

    eng = Engine(spark=spark)
    ds = eng.open(f"{sf_dir}/orders.parquet")
    prof = {p["column_name"]: p for p in ds.profile()}
    assert prof["o_orderkey"]["rows"] == 1500
    assert prof["o_orderkey"]["nulls"] == 0
    assert prof["o_orderkey"]["min"] == 0 and prof["o_orderkey"]["max"] == 1499
    assert abs(prof["o_orderkey"]["approx_distinct"] - 1500) <= 150


def test_compact_table_merges_small_files(spark, tmp_path):
    from vscode_parquet_visualizer_spark.operators.scale import compact_table

    p = str(tmp_path / "frag")
    spark.range(0, 10000).repartition(40).write.parquet(p)
    import os

    n_before = sum(f.endswith(".parquet") for _, _, fs in os.walk(p) for f in fs)
    assert n_before >= 40
    stats = compact_table(spark, p, target_file_bytes=1 << 30)
    assert stats["files_before"] == n_before
    assert stats["files_after"] == 1
    assert spark.read.parquet(p).count() == 10000
    # no leftover temp/old dirs
    assert not os.path.exists(p + ".__compact_tmp__")
    assert not os.path.exists(p + ".__compact_old__")


def test_compact_table_sort_within(spark, tmp_path):
    from vscode_parquet_visualizer_spark.operators.scale import compact_table

    p = str(tmp_path / "sorted")
    spark.range(0, 5000).selectExpr(
        "id", "CAST(id % 97 AS INT) AS k"
    ).repartition(16).write.parquet(p)
    compact_table(spark, p, target_file_bytes=1 << 30, sort_within_by=["k"])
    pdf = spark.read.parquet(p).toPandas()
    assert len(pdf) == 5000
    # within the single output file, k is non-decreasing
    assert (pdf["k"].diff().dropna() >= 0).all()

"""Bisect the running-agg substrate-build cost at a given SF dir:
time each incremental piece of the stage-16 shape (range shuffle ->
sort -> mcols render -> persist -> stats agg) in isolation.

Usage: python tools/ragg_bisect.py [SF_DIR]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from vscode_parquet_visualizer_spark.session import get_spark  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf10"
spark = get_spark(app_name="ragg_bisect")
spark.sparkContext.setLogLevel("ERROR")

base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
    "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderdate"
)
# warm the page cache / JVM
base.write.format("noop").mode("overwrite").save()

_SEP = "\x1f"


def noop(df, label):
    spark.sparkContext.setJobDescription(label)
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    t = time.monotonic() - t0
    print(f"{label:45s} {t:7.2f} s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return t


sort_cols = [F.col("o_orderstatus"), F.col("o_orderdate")]
sorted_df = base.repartitionByRange(32, *sort_cols).sortWithinPartitions(
    *sort_cols
)
noop(sorted_df, "a: range shuffle + sort")

wkey = F.translate(
    F.concat_ws(
        _SEP,
        F.coalesce(F.col("o_orderstatus").cast("string"), F.lit("\x1eNULL")),
    ),
    "\x00",
    "\x1e",
)
tkey = F.translate(
    F.concat_ws(
        _SEP,
        F.coalesce(F.col("o_orderdate").cast("string"), F.lit("\x1eNULL")),
    ),
    "\x00",
    "\x1e",
)
mcols = {
    "__rpid": F.spark_partition_id(),
    "__rwkey": wkey,
    "__rm0": F.col("o_totalprice"),
    "__rtkey": tkey,
    "__rmid": F.monotonically_increasing_id(),
}
s = sorted_df.withColumns(mcols)
noop(s, "b: + mcols (key renders, mid)")

p = s.persist()
t0 = time.monotonic()
n = p.count()
print(f"{'c: persist + count (cache build)':45s} {time.monotonic()-t0:7.2f} s  rows={n}", flush=True)

aggs = [
    F.count(F.lit(1)).alias("__an"),
    F.sum("__rm0").alias("__av0"),
    F.count("__rm0").alias("__ac0"),
    F.min("__rmid").alias("__amn"),
    F.max("__rmid").alias("__amx"),
    F.min_by("__rtkey", "__rmid").alias("__aft"),
    F.max_by("__rtkey", "__rmid").alias("__alt"),
]
t0 = time.monotonic()
stats = p.groupBy("__rpid", "__rwkey").agg(*aggs).collect()
print(f"{'d: stats agg over cache':45s} {time.monotonic()-t0:7.2f} s  groups={len(stats)}", flush=True)

# e: the same stats agg directly over the uncached sorted plan
t0 = time.monotonic()
stats2 = s.groupBy("__rpid", "__rwkey").agg(*aggs).collect()
print(f"{'e: stats agg, no cache (fresh sort)':45s} {time.monotonic()-t0:7.2f} s  groups={len(stats2)}", flush=True)

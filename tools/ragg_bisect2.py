"""Bisect WHICH mcols expression costs ~87 s at sf10.

Usage: python tools/ragg_bisect2.py [SF_DIR]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from vscode_parquet_visualizer_spark.session import get_spark  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf10"
spark = get_spark(app_name="ragg_bisect2")
spark.sparkContext.setLogLevel("ERROR")

base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
    "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderdate"
)
base.write.format("noop").mode("overwrite").save()

_SEP = "\x1f"


def noop(df, label):
    spark.sparkContext.setJobDescription(label)
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    t = time.monotonic() - t0
    print(f"{label:50s} {t:7.2f} s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return t


sort_cols = [F.col("o_orderstatus"), F.col("o_orderdate")]
sorted_df = base.repartitionByRange(32, *sort_cols).sortWithinPartitions(
    *sort_cols
)
noop(sorted_df, "sort only")

cases = {
    "pid": {"__rpid": F.spark_partition_id()},
    "mid": {"__rmid": F.monotonically_increasing_id()},
    "status cast str": {"__x": F.col("o_orderstatus").cast("string")},
    "date cast str": {"__x": F.col("o_orderdate").cast("string")},
    "status coalesce": {
        "__x": F.coalesce(
            F.col("o_orderstatus").cast("string"), F.lit("\x1eNULL")
        )
    },
    "concat_ws(status)": {
        "__x": F.concat_ws(
            _SEP,
            F.coalesce(
                F.col("o_orderstatus").cast("string"), F.lit("\x1eNULL")
            ),
        )
    },
    "translate(concat_ws(status))": {
        "__x": F.translate(
            F.concat_ws(
                _SEP,
                F.coalesce(
                    F.col("o_orderstatus").cast("string"), F.lit("\x1eNULL")
                ),
            ),
            "\x00",
            "\x1e",
        )
    },
    "translate(concat_ws(date))": {
        "__x": F.translate(
            F.concat_ws(
                _SEP,
                F.coalesce(
                    F.col("o_orderdate").cast("string"), F.lit("\x1eNULL")
                ),
            ),
            "\x00",
            "\x1e",
        )
    },
    "pid+mid": {
        "__rpid": F.spark_partition_id(),
        "__rmid": F.monotonically_increasing_id(),
    },
}
for label, mc in cases.items():
    noop(sorted_df.withColumns(mc), f"sort + {label}")

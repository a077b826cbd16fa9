"""Measure the running-agg + lag route table entries at a given SF dir
(PERF.md window-family route policy). Usage:

    python tools/ragg_bench.py [SF_DIR] [reps]

Prints min-of-N wall for each (family, route). Load-gate the box first
(memory: /proc/loadavg 1-min < 0.7)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench/sf10"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from vscode_parquet_visualizer_spark.session import get_spark  # noqa: E402
from vscode_parquet_visualizer_spark.plans.sql_gateway import run_sql  # noqa: E402

spark = get_spark()
spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
    "orders"
)

CASES = {
    # the r13 route table's "running sum (ORDER BY, default frame)" row
    "running_sum_range": """
        SELECT o_orderkey,
               sum(o_totalprice) OVER (PARTITION BY o_orderstatus
                                       ORDER BY o_orderdate) AS rs
        FROM orders
    """,
    # rows-frame (total order): no tie fixup stage
    "running_sum_rows": """
        SELECT o_orderkey,
               sum(o_totalprice) OVER (PARTITION BY o_orderstatus
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
        FROM orders
    """,
    "lag": """
        SELECT o_orderkey,
               lag(o_totalprice) OVER (PARTITION BY o_orderstatus
                                       ORDER BY o_orderdate, o_orderkey)
                   AS prev
        FROM orders
    """,
}


def measure(sql: str, route: str) -> float:
    os.environ["SPARK_GRAFT_RANK"] = route
    best = float("inf")
    try:
        for _ in range(reps):
            t0 = time.monotonic()
            run_sql(spark, sql).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
    finally:
        os.environ.pop("SPARK_GRAFT_RANK", None)
    return best


print(f"sf_dir={sf_dir} reps={reps} load={open('/proc/loadavg').read().split()[0]}")
for name, sql in CASES.items():
    for route in ("window", "distributed"):
        t = measure(sql, route)
        print(f"{name:20s} {route:12s} {t:7.2f} s", flush=True)

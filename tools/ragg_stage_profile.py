"""One fresh build+exec of a running-agg route with per-stage metrics
(duration, executor CPU, GC, shuffle, spill) from the UI REST API —
pinpoints WHERE the distributed route's time goes (guide §1/§7).

Usage: python tools/ragg_stage_profile.py {range|rows|lag} [sf_dir]
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from vscode_parquet_visualizer_spark.session import get_spark  # noqa: E402
from vscode_parquet_visualizer_spark.plans.sql_gateway import run_sql  # noqa: E402

case = sys.argv[1] if len(sys.argv) > 1 else "range"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench/sf10"

SQLS = {
    "range": """SELECT o_orderkey, sum(o_totalprice) OVER (
        PARTITION BY o_orderstatus ORDER BY o_orderdate) AS rs FROM orders""",
    "rows": """SELECT o_orderkey, sum(o_totalprice) OVER (
        PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs FROM orders""",
    "lag": """SELECT o_orderkey, lag(o_totalprice) OVER (
        PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey) AS p
        FROM orders""",
}

spark = get_spark(app_name="ragg_stage_profile")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
    "orders"
)
os.environ["SPARK_GRAFT_RANK"] = "distributed"
# tiny warmup so JVM/codegen/python-worker init is outside the measurement
# (a real small VIEW — an outer LIMIT would not shrink the lowered child,
# so the old spelling silently ran the full 15 M-row route as "warmup")
spark.read.parquet(f"{sf_dir}/orders.parquet").limit(1000).createOrReplaceTempView(
    "orders_warm"
)
run_sql(
    spark, SQLS[case].replace("FROM orders", "FROM orders_warm")
).write.format("noop").mode("overwrite").save()

t0 = time.monotonic()
df = run_sql(spark, SQLS[case])
t1 = time.monotonic()
df.write.format("noop").mode("overwrite").save()
t2 = time.monotonic()
print(f"{case}: build={t1 - t0:.2f}s exec={t2 - t1:.2f}s total={t2 - t0:.2f}s")

ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId
with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
    stages = json.loads(r.read())
print(
    f"{'id':>4} {'dur_s':>7} {'cpu_s':>7} {'gc_s':>6} {'tasks':>5} "
    f"{'in_MB':>7} {'sh_r':>6} {'sh_w':>6} {'spill':>6}  name"
)
for s in sorted(stages, key=lambda x: x["stageId"]):
    if s["status"] != "COMPLETE":
        continue
    dur = (s.get("executorRunTime") or 0) / 1e3
    cpu = (s.get("executorCpuTime") or 0) / 1e9
    gc = (s.get("jvmGcTime") or 0) / 1e3
    print(
        f"{s['stageId']:>4} {dur:>7.1f} {cpu:>7.1f} {gc:>6.1f} "
        f"{s['numCompleteTasks']:>5} {s['inputBytes'] / 1e6:>7.0f} "
        f"{s['shuffleReadBytes'] / 1e6:>6.0f} "
        f"{s['shuffleWriteBytes'] / 1e6:>6.0f} "
        f"{s['diskBytesSpilled'] / 1e6:>6.0f}  {s['name'][:60]}"
    )

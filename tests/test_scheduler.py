"""FAIR-pool isolation (engine.scheduler_pool): a long query must not
starve interactive paging — the reference's two-worker-per-document
design (src/tabular-document-editor.ts:154-186) re-expressed as Spark
FAIR scheduler pools in one session."""

import threading
import time

import pytest
from pyspark.sql import functions as F

from vscode_parquet_visualizer_spark.engine import (
    Engine,
    POOL_INTERACTIVE,
    POOL_QUERY,
    scheduler_pool,
)


def test_fair_mode_enabled(spark):
    assert spark.conf.get("spark.scheduler.mode") == "FAIR"


def test_pool_property_scoped(spark):
    sc = spark.sparkContext
    assert sc.getLocalProperty("spark.scheduler.pool") is None
    with scheduler_pool(spark, POOL_QUERY):
        assert sc.getLocalProperty("spark.scheduler.pool") == POOL_QUERY
        with scheduler_pool(spark, POOL_INTERACTIVE):
            assert (
                sc.getLocalProperty("spark.scheduler.pool")
                == POOL_INTERACTIVE
            )
        assert sc.getLocalProperty("spark.scheduler.pool") == POOL_QUERY
    assert sc.getLocalProperty("spark.scheduler.pool") is None


def test_paging_not_starved_by_long_query(spark, sf_dir):
    """With FIFO scheduling the page fetch would queue behind the ~60
    remaining slow tasks (~4 s on the 4-core test session); with FAIR
    pools it gets the next free slot. Generous bounds: the page must
    come back while the slow job is still running."""
    eng = Engine(spark=spark)
    ds = eng.open(f"{sf_dir}/orders.parquet")
    rs = ds.query("SELECT o_orderkey, o_totalprice FROM data LIMIT 500")

    @F.pandas_udf("long")
    def slow(x):
        time.sleep(0.25)
        return x

    slow_df = spark.range(64).repartition(64).select(slow("id").alias("v"))
    state = {}

    def run_slow():
        with scheduler_pool(spark, POOL_QUERY):
            t0 = time.perf_counter()
            state["sum"] = slow_df.agg(F.sum("v")).collect()[0][0]
            state["slow_s"] = time.perf_counter() - t0

    th = threading.Thread(target=run_slow)
    th.start()
    time.sleep(0.8)  # let the slow job occupy the executor slots
    t0 = time.perf_counter()
    page = rs.page(1, 20)
    page_s = time.perf_counter() - t0
    slow_was_running = th.is_alive()
    th.join()
    assert len(page) == 20
    assert state["sum"] == 64 * 63 // 2
    # the interactive job finished while the query pool was still busy
    assert slow_was_running, "slow job ended too early for the race to test anything"
    assert page_s < state["slow_s"] / 2, (page_s, state["slow_s"])

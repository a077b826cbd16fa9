"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full workload registry
(vscode_parquet_visualizer_spark/workload.py) — one entry per implemented
operator from SURVEY.md §2 plus the training-data pipeline operators.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vscode_parquet_visualizer_spark import workload  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary through the full engine
    path (scan → filter pushdown → partial agg → shuffle of 6 groups)."""
    return workload.QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The curated 50-entry driver registry (workload.DRIVER_KEYS): the
    correctness driver records at most 50 sorted keys, so merged suite
    gates (q80+) fold the fine-grained q50+ tail into this window. The
    full fine-grained registry stays in workload.queries() and is run by
    tools/oracle_check.py, pytest, and bench.py."""
    return workload.driver_queries()


def oracle_sql() -> dict[str, str]:
    return workload.driver_oracle_sql()

"""One SQL entry point for DuckDB-dialect text on Spark.

The reference passes the query tab's text verbatim to DuckDB
(src/duckdb-backend.ts:142-146); this module is the Spark-side
equivalent: route the statements that need an operator (ASOF JOIN,
POSITIONAL JOIN, dynamic PIVOT) and transpile everything else through
plans/dialect.py. ``Engine.sql`` and ``Dataset.query`` call this so
every surface goes through the same path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from vscode_parquet_visualizer_spark.plans import dialect
from vscode_parquet_visualizer_spark.plans.asof_sql import (
    try_rewrite_asof,
    try_rewrite_positional,
)
from vscode_parquet_visualizer_spark.plans.pivot_sql import try_rewrite_pivot

_ROUTED_JOIN = re.compile(
    r"\b(ASOF\s+(LEFT\s+)?|POSITIONAL\s+)JOIN\b", re.IGNORECASE
)


def run_sql(
    spark: SparkSession,
    sql: str,
    view: str = "data",
    columns: list[str] | None = None,
    dataset_path: str | None = None,
    array_columns: set[str] | None = None,
) -> DataFrame:
    """Execute DuckDB-dialect ``sql`` and return the result DataFrame.

    ``view``/``dataset_path`` bind the ``data`` placeholder relation
    first (so routed statements see the caller's dataset), then:
    ASOF/POSITIONAL JOIN → operator-backed rewrite (plans/asof_sql.py),
    full-statement dynamic ``PIVOT`` → lowered grouped aggregation
    (plans/pivot_sql.py), everything else → dialect.transpile →
    ``spark.sql``."""
    bound = dialect.rewrite_from_data(
        sql.rstrip().rstrip(";"), view=view, dataset_path=dataset_path
    )
    if _ROUTED_JOIN.search(bound):
        routed = try_rewrite_asof(spark, bound) or try_rewrite_positional(
            spark, bound
        )
        if routed is not None:
            bound = routed
    pivoted = try_rewrite_pivot(spark, bound)
    if pivoted is not None:
        return pivoted
    return spark.sql(
        dialect.transpile(
            bound,
            view=view,
            columns=columns,
            dataset_path=dataset_path,
            array_columns=array_columns,
        )
    )

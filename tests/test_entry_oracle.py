"""Differential tests against the DuckDB oracle — a fast subset of the
driver's correctness gate (full sweep: python tools/oracle_check.py)."""

import duckdb
import pytest

from vscode_parquet_visualizer_spark import workload
from tools.oracle_check import compare

SUBSET = [
    "q01_pricing_summary",
    "q08_topk_per_customer",
    "q11_rollup",
    "q28_asof_join",
    "q33_dedup_exact",
    "q34_ngram_jaccard",
    "q37_text_stats",
    "q40_similarity_bruteforce",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in workload.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_every_oracle_key_has_query():
    assert set(workload.oracle_sql()) <= set(workload.queries())


def test_workload_size():
    assert len(workload.queries()) >= 40
    assert len(workload.oracle_sql()) >= 35


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_match(name, spark, sf_dir, duck):
    spark_pdf = workload.QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = duck.sql(workload.ORACLES[name]).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, problems

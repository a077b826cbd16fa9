"""Differential tests against the DuckDB oracle — a fast subset of the
driver's correctness gate (full sweep: python tools/oracle_check.py)."""

import duckdb
import pytest

from vscode_parquet_visualizer_spark import workload
from tools.oracle_check import compare

# Round 7: the round-6 q74 regression shipped with a GREEN pytest because
# this file only ran a 12-query subset — the driver gate and the test
# suite could disagree. Now EVERY driver-window query runs end-to-end
# against its oracle at sf0.001 (cheap: the judge's full sf0.01 sweep is
# ~3 min; sf0.001 is far smaller).
SUBSET = list(workload.DRIVER_KEYS)


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


# Round 4: EVERY driver-window query now carries a value-hash oracle —
# the former rows-only set (hash families, k-means, iterative, media)
# was recomposed so each hash-dependent candidate stage feeds an
# engine-exact verify stage whose output an SQL oracle can recompute.
ROWS_ONLY: set[str] = set()

# rows-only gates OUTSIDE the driver window (no DuckDB counterpart)
NO_ORACLE_TAIL = {"q9a_media_codecs"}


def test_driver_window_contract():
    """The correctness driver records at most 50 sorted keys; the curated
    registry must fill that window exactly, with every entry registered
    and oracle-gated unless it is a by-design rows-only operator."""
    dq = workload.driver_queries()
    do = workload.driver_oracle_sql()
    assert len(dq) == 50
    assert list(dq) == workload.DRIVER_KEYS
    assert set(dq) <= set(workload.queries())
    assert set(dq) - set(do) == ROWS_ONLY
    # every q80+ key (driver suites + post-crossover gates) plus the q78
    # curation suite is excluded from bench totals so cross-round
    # subtotals stay comparable
    assert workload.SUITE_KEYS == {
        k for k in workload.QUERIES if k >= "q80" or k == "q78_curation_suite"
    }
    assert {k for k in workload.DRIVER_KEYS if k >= "q80"} <= workload.SUITE_KEYS
    assert all(
        k in workload.ORACLES
        for k in workload.SUITE_KEYS - ROWS_ONLY - NO_ORACLE_TAIL
    )


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_match(name, spark, sf_dir, duck):
    spark_pdf = workload.QUERIES[name](spark, sf_dir).toPandas()
    if name in ROWS_ONLY:
        assert len(spark_pdf) >= 0  # rows-only gate: must just execute
        return
    duck_pdf = duck.sql(workload.ORACLES[name]).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, problems

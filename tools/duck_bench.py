"""Time the oracle-subset SQL on DuckDB for a given sf dir — the baseline
side of the Spark-vs-DuckDB crossover (PERF.md). Mirrors bench.py's
protocol: full query executes, results fetched (DuckDB is in-process;
fetchall is its materialization), per-query wall seconds, one JSON line.

Usage: python tools/duck_bench.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    # Mirror bench.py's selection exactly (the full fine-grained oracle
    # registry minus the q80+ suite gates, which re-measure merged work)
    # so the Spark and DuckDB subtotals cover the same query set.
    from vscode_parquet_visualizer_spark import workload

    oracles = {
        k: v for k, v in workload.ORACLES.items() if k not in workload.SUITE_KEYS
    }

    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count()}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    timings: dict[str, float] = {}
    failed: list[str] = []
    for name, sql in sorted(oracles.items()):
        best = None
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 4)
        except Exception as exc:
            failed.append(name)
            print(f"duck error in {name}: {exc}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_wall_time",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "failed": failed,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()

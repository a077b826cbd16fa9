"""Symmetric Spark-vs-DuckDB crossover: N cold PROCESS runs of bench.py
(each internally min-of-2 in-process reps, full per-query detail from
BENCH_DETAIL.json) against duck_bench.py (min over the same number of
in-process reps × process runs), per-query minima, one JSON report.

Usage: python tools/crossover.py OUT.json SF_DIR [SF_DIR ...]
       (e.g. python tools/crossover.py CROSSOVER_r04.json \
             /root/testdata/sf0.1 .bench/sf1 .bench/sf10)

The report carries THREE totals per sf so algorithm changes can't
silently flatter the ratio:
- oracle_total:     every query that has a DuckDB oracle (minus suites)
- r03_subset_total: the queries that already had oracles in round 3 —
  the like-for-like series against CROSSOVER_r03.json (the seven
  round-4 verify-composed gates run a deliberately naive O(n²) oracle
  on DuckDB, which would otherwise inflate DuckDB's side)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# gates that gained oracles in round 4 (hash-family candidate stages
# composed with exact verify): excluded from the like-for-like series
ROUND4_NEW_ORACLES = {
    "q35_minhash_lsh",
    "q36_simhash",
    "q41_similarity_lsh",
    "q42_embedding_near_dup",
    "q44_multimodal_features",
    "q62_similarity_ivf",
    "q67_dedup_clusters",
}


def spark_runs(sf_dir: str, n: int) -> list[dict[str, float]]:
    out = []
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    for _ in range(n):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            cwd=REPO,
        )
        detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
        out.append({k: float(v) for k, v in detail["queries"].items() if v >= 0})
    return out

def duck_run(sf_dir: str, reps: int) -> dict[str, float]:
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "duck_bench.py"),
            sf_dir,
            str(reps),
        ],
        check=True,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    return json.loads(p.stdout.strip().splitlines()[-1])["queries"]


def main() -> None:
    out_path = sys.argv[1]
    sf_dirs = sys.argv[2:]
    n_proc = int(os.environ.get("CROSSOVER_RUNS", "2"))
    report: dict = {"spark": {}, "duckdb": {}, "ratios": {}}
    for sf_dir in sf_dirs:
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        runs = spark_runs(sf_dir, n_proc)
        spark_min = {
            k: round(min(r.get(k, float("inf")) for r in runs), 4)
            for k in set().union(*[set(r) for r in runs])
            if all(k in r for r in runs)
        }
        duck = duck_run(sf_dir, 3)  # same in-process rep count as bench.py
        common = sorted(set(spark_min) & set(duck))
        like = [k for k in common if k not in ROUND4_NEW_ORACLES]
        s_all = sum(spark_min[k] for k in common)
        d_all = sum(duck[k] for k in common)
        s_like = sum(spark_min[k] for k in like)
        d_like = sum(duck[k] for k in like)
        report["spark"][sf] = {
            "oracle_total_sec_min": round(s_all, 3),
            "r03_subset_total_sec_min": round(s_like, 3),
            "queries": spark_min,
        }
        report["duckdb"][sf] = {
            "oracle_total_sec_min": round(d_all, 3),
            "r03_subset_total_sec_min": round(d_like, 3),
            "queries": duck,
        }
        report["ratios"][sf] = {
            "oracle": round(s_all / d_all, 2) if d_all else None,
            "r03_subset": round(s_like / d_like, 2) if d_like else None,
            "n_common": len(common),
        }
        print(
            f"sf{sf}: spark {s_all:.2f}s vs duck {d_all:.2f}s = "
            f"{s_all / d_all:.2f}x (like-for-like {s_like:.2f}/"
            f"{d_like:.2f} = {s_like / d_like:.2f}x over {len(like)})"
        )
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()

"""Benchmark: run the workload's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric", "value" (total sec), "unit", "queries": {name: sec},
"sf"}.

Execution is measured with the noop sink (full plan runs, nothing collected
to the driver) — the honest analogue of "query wall time" for a distributed
engine. Session startup is excluded; a tiny warmup query primes the JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vscode_parquet_visualizer_spark import workload  # noqa: E402
from vscode_parquet_visualizer_spark.session import get_spark  # noqa: E402


# Frozen shed set (r15, r14 verdict item 1): the driver's PERF diff keys
# on the stdout line's `queries` dict, so a TIMING-dependent shed set
# manufactures phantom dropped/new-in-bench entries every round (r14: 7
# "dropped", 3 "new" — all artifacts). Renaming keys to shorter ones
# would fix the width but the driver contract forbids renames, so
# instead: (a) the line is minified (compact separators, lean envelope —
# full detail still goes to BENCH_DETAIL.json), which fits 71 of the 78
# full-name entries; (b) the 7 that cannot fit are ALWAYS the same ones
# — this frozen list, exactly the set r14's line shed (they are the 7
# fastest queries, 0.05-0.11 s committed detail), so the line's key set
# is a strict superset of r14's (0 dropped) and identical from r15 on
# (0 dropped/new forever); (c) the shed entries still reach the line in
# the compact `qshed` string ("q06:.07,…" — unique prefixes), so every
# per-query timing is in the driver's record even for shed queries.
# Dynamic fastest-first shedding remains ONLY as a last-resort fallback
# (e.g. a contaminated run pushing many values to ≥10 s widths).
_LINE_SHED_ORDER = (
    "q06_revenue_forecast",
    "q07_customers_without_orders",
    "q09_running_total",
    "q19_case_when",
    "q21_date_functions",
    "q38_lang_id",
    "q77_positional_sql",
)


def shed_to_fit(
    line_out: dict, timings: dict[str, float], limit: int = 1990
) -> str:
    """Serialize the stdout JSON line so it fits ``limit`` — the driver
    records only the last 2000 chars of stdout and parses the final
    line, so an over-long line is recorded as parsed=null (rounds 1-2
    both hit this). Minified JSON; if over, shed the FROZEN set first
    (key-set stability for the driver's round-over-round diff), then
    fastest-first; shed timings stay visible in the compact ``qshed``
    field."""
    ok = {k: v for k, v in timings.items() if v >= 0}

    def render(kept: set, shed: list) -> str:
        d = dict(line_out)
        d["queries"] = {k: round(ok[k], 2) for k in sorted(kept)}
        if shed:
            d["qshed"] = ",".join(
                f"{k.split('_', 1)[0]}:{('%.2f' % ok[k]).lstrip('0')}"
                for k in sorted(shed)
            )
        return json.dumps(d, separators=(",", ":"))

    kept = set(ok)
    shed: list = []
    text = render(kept, shed)
    if len(text) <= limit:
        return text
    order = [k for k in _LINE_SHED_ORDER if k in kept]
    order += sorted(
        (k for k in kept if k not in _LINE_SHED_ORDER), key=ok.get
    )
    for k in order:
        kept.discard(k)
        shed.append(k)
        text = render(kept, shed)
        if len(text) <= limit:
            return text
    # pathological fallback (qshed itself outgrew the limit): plain
    # fastest-first shedding with no qshed — the pre-r15 behavior
    slowest = sorted(ok, key=ok.get, reverse=True)
    keep_n = len(slowest)
    while keep_n > 0:
        text = render(set(slowest[:keep_n]), [])
        if len(text) <= limit:
            return text
        keep_n -= max(1, keep_n // 10)
    return render(set(), [])


def _reference_timings(here: str, sf: str) -> dict[str, float]:
    """Per-query reference times for end-of-sweep outlier detection
    (r11 verdict item 1: two rounds in a row the official bench record
    was contamination-shaped — q16 4.47 s vs 0.145 s in the same-code
    rehearsal). Sources, same-sf only: the latest committed load-gated
    crossover artifact, plus the committed BENCH_DETAIL; where both
    know a query, the smaller (cleaner) reading wins."""
    import glob as _glob
    import re as _re

    refs: dict[str, float] = {}

    def _take(d: dict):
        for k, v in (d or {}).items():
            if isinstance(v, (int, float)) and v > 0:
                refs[k] = min(refs.get(k, v), float(v))

    def _round_no(path):
        m = _re.search(r"CROSSOVER_r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else -1

    latest = max(
        _glob.glob(os.path.join(here, "CROSSOVER_r*.json")),
        key=_round_no,
        default=None,
    )
    if latest:
        try:
            with open(latest) as fh:
                _take(json.load(fh)["spark"].get(sf, {}).get("queries"))
        except (OSError, KeyError, ValueError):
            pass
    try:
        with open(os.path.join(here, "BENCH_DETAIL.json")) as fh:
            detail = json.load(fh)
        if str(detail.get("sf")) == str(float(sf)):
            _take(detail.get("queries"))
    except (OSError, ValueError):
        pass
    return refs


def _measure(fn, spark, sf_dir, reps: int, max_extra: int = 3):
    """One query's timing: returns (cold_sec, warm_min_sec, n_warm).

    Rep 1 pays query construction (dialect transpile, DataFrame
    building, any driver-side fit); later reps REUSE the analyzed plan
    — the steady state an interactive session sees for a repeated
    query, and the analogue of DuckDB re-running a prepared statement.
    The reported figure is the min over WARM reps only (r10 verdict
    item 3). Warm reps EXTEND past the default (up to ``max_extra``
    more) while the warm spread exceeds 2× — two reps proved too few
    when the box degrades mid-run (r11: both warm reps of q16 read
    ≥4.47 s under load_avg 3-5 where the true value was 0.145 s)."""
    df = None
    cold = None
    warm: list[float] = []
    want_warm = reps - 1
    while True:
        t0 = time.perf_counter()
        if df is None:
            df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        if cold is None:
            cold = dt
            if reps == 1:
                return cold, cold, 0
            continue
        warm.append(dt)
        if len(warm) < want_warm:
            continue
        spread_bad = (
            min(warm) > 0.05 and max(warm) / min(warm) > 2.0
        )
        if spread_bad and want_warm < (reps - 1) + max_extra:
            want_warm += 1
            continue
        return cold, min(warm), len(warm)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Headless run: the UI's event-bus listeners tax every one of the
    # ~170 jobs this bench fires (measured ~7% of the trivial-action
    # floor). The engine/session default keeps the UI for debugging.
    spark = get_spark(
        app_name="bench",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Size-aware execution profile: AQE's stage-by-stage re-planning costs
    # ~0.2 s/query — indispensable at 100 TB (skew splits, runtime
    # broadcast), pure overhead on a sub-GB interactive dataset where the
    # plan is knowable upfront. Mirror of the reference sizing its engine
    # to the machine (SET threads, duckdb-backend.ts:59-65).
    input_bytes = 0
    for root, _, files in os.walk(sf_dir):  # tables may be dirs of parts
        for f in files:
            if f.endswith(".parquet"):
                input_bytes += os.path.getsize(os.path.join(root, f))
    interactive = os.environ.get("SPARK_GRAFT_INTERACTIVE")
    if interactive is not None:
        small = interactive == "1"  # explicit override (A/B experiments)
    else:
        small = input_bytes < 1024**3
    if small:
        # Interactive profile: AQE's per-stage materialize-and-replan is
        # the dominant fixed cost on sub-GB data (measured: q20 1.16 s →
        # 0.04 s, q01 0.67 → 0.23, trivial-action floor 0.10 → 0.03 with
        # AQE off) while buying nothing — the plan is knowable upfront.
        # At ≥2 GiB AQE stays on: skew splits and runtime broadcasts are
        # indispensable at 100 TB. Few static shuffle partitions for the
        # same reason (32 near-empty tasks cost ~ms each to schedule).
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        # Broadcast only true dimension tables (region/nation-sized) on
        # the interactive profile: every broadcast is a per-ACTION
        # driver collect + rebuild (~0.1-0.3 s), while the hot tables
        # are cached hash-partitioned on their join keys so a
        # shuffled-hash join runs exchange-free. Min-of-3 A/B over the
        # 9 join-heavy heads: 2.27 s @ 64m -> 1.42 s @ 512k (q04
        # 0.39->0.12, q03 0.34->0.16). The 64m default stays for the
        # large profile, where broadcasts amortize over real scan work.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "512k")
        # Planning is ~half the per-query wall time at sub-GB scale
        # (measured r9: q01 plan 105 ms vs exec ~0 ms; q74 263 vs 85).
        # Constraint propagation walks the expression tree per filter/
        # join to infer IsNotNull/transitive predicates — valuable when
        # a pushed-down inferred filter skips terabytes, pure planning
        # overhead when the whole input is cached in memory (measured
        # interleaved A/B: full oracle subset 14.5/14.8 s -> 14.1/13.2).
        # The large profile keeps it on: inferred pushdowns matter when
        # scans are real.
        spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    # Both profiles prefer shuffled-hash over sort-merge, for different
    # reasons: sub-GB builds fit in memory with room to spare and skip
    # both sort passes (interleaved min-of-3 A/B at sf1: join-heavy
    # subset ~6% faster); at the large profile the hot tables are cached
    # hash-partitioned on their join keys (workload._CACHE_KEYS), so the
    # fact joins run exchange-free — but only a shuffled-HASH join
    # exploits that without re-sorting 60 M rows per query (SMJ keeps
    # its two Sort passes even when the Exchange is elided), and the
    # hash build is bounded by the cache's size-derived partitioning
    # (~8 MiB of source rows per partition per table). On a true 100 TB
    # deployment with unbounded-skew inputs the SMJ default is the safer
    # posture and this stays a conf, not code.
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")

    # Ad-hoc conf overrides for A/B experiments, e.g.
    # SPARK_GRAFT_CONF="spark.sql.codegen.wholeStage=false;..."
    for kv in filter(None, os.environ.get("SPARK_GRAFT_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        spark.conf.set(k.strip(), v.strip())

    # Warm up one-time machinery outside the measurement: JVM/codegen,
    # the shared table cache (each parquet is scanned once for the whole
    # 47-query run), and the Python UDF worker pool (mapInPandas spawns
    # workers lazily on first use).
    # SPARK_GRAFT_WARM_TABLES=0 (r15, r14 verdict item 7) skips the
    # table-cache warm so the FIRST query that touches each hot table
    # pays its cache populate inside the timed region — the recorded
    # cache-posture run that makes the base-table-persist cost visible
    # (PERF.md "measurement posture"). Default unchanged: warm outside,
    # the interactive open-dataset model both engines get.
    tables = workload.load_tables(spark, sf_dir)
    if os.environ.get("SPARK_GRAFT_WARM_TABLES", "1") != "0":
        for t in workload._HOT:
            tables[t].count()
    import pandas as pd

    spark.range(4).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()
    # ... and the package import inside those workers: the first pandas UDF
    # whose closure references package modules makes every worker import
    # the shipped zip (~1-2 s each, all cores at once). 2×cores tasks so
    # every worker slot pays it here, not inside a measured query.
    from pyspark.sql import functions as F  # noqa: N812

    from vscode_parquet_visualizer_spark.operators import dedup as _dedup

    cores = spark.sparkContext.defaultParallelism
    spark.range(2 * cores).repartition(2 * cores).select(
        _dedup.minhash_from_hashed(F.array("id"), 4, 1).alias("s")
    ).write.mode("overwrite").format("noop").save()
    # ... and the streaming machinery: the FIRST streaming query of each
    # stateful shape pays one-time init (state-store classes, streaming
    # codegen for that operator family). Warm the three families —
    # windowed agg, watermarked dedup, stream-stream join — on a tiny
    # 200-row slice so measured streaming queries pay only their own
    # work. The measured queries still start fresh checkpoints and
    # recompute everything.
    try:
        import tempfile

        from pyspark.sql import functions as SF

        from vscode_parquet_visualizer_spark.streaming import events as _sev
        from vscode_parquet_visualizer_spark.streaming.joins import (
            purchases_with_prior_views,
        )

        warm_dir = os.path.join(tempfile.gettempdir(), "bench_stream_warm")
        tables["events"].limit(200).coalesce(1).write.mode(
            "overwrite"
        ).parquet(warm_dir)
        schema = spark.read.parquet(warm_dir).schema

        def _warm_stream():
            return _sev.read_events_stream(spark, warm_dir, schema=schema)

        _sev.run_to_memory(
            _sev.windowed_counts(_warm_stream()),
            "bench_warm_agg",
            output_mode="complete",
        )
        _sev.run_to_memory(
            _warm_stream()
            .withWatermark("ts", "1 hour")
            .dropDuplicates(["event_id"]),
            "bench_warm_dedup",
        )
        _sev.run_to_memory(
            purchases_with_prior_views(_warm_stream()), "bench_warm_join"
        )
        _sev.run_to_memory(
            _sev.sessionize(_warm_stream()), "bench_warm_sess"
        )
    except Exception as exc:  # warmup must never kill the bench
        print(f"stream warmup skipped: {exc}", file=sys.stderr)

    # SPARK_GRAFT_ONLY=oracle restricts to the DuckDB-comparable subset
    # (the crossover runs use this: the pipeline operators have no DuckDB
    # counterpart to cross over against)
    only = os.environ.get("SPARK_GRAFT_ONLY")
    # Suite gates (q80+) re-measure work already timed by their
    # fine-grained components; skip them so totals stay comparable
    # across rounds.
    selected = sorted(
        (k, v) for k, v in workload.QUERIES.items() if k not in workload.SUITE_KEYS
    )
    # SPARK_GRAFT_QUERIES=q20_...,q17_... restricts to named queries
    # (isolating one query inside the full bench context). Selects from
    # the FULL registry — explicit names override the suite-key skip.
    names = os.environ.get("SPARK_GRAFT_QUERIES")
    if names:
        want = {s.strip() for s in names.split(",") if s.strip()}
        selected = sorted(
            (k, v) for k, v in workload.QUERIES.items() if k in want
        )
    if only == "oracle":
        selected = [(k, v) for k, v in selected if k in workload.ORACLES]

    # Per-query time is the min over SPARK_GRAFT_REPS in-process
    # executions (default 2) — the SAME protocol as the DuckDB baseline
    # (tools/duck_bench.py, min-of-2 per query with an in-process warm
    # second run). Rep 1 is cold (plan + codegen + run), rep 2 is the
    # steady state an interactive session sees; symmetric with what the
    # DuckDB side's second rep gets.
    # Default raised 2→3 in round 9: Catalyst planning is re-paid on
    # every rep (the write sink builds a fresh QueryExecution), and the
    # JVM JIT needs ~2 passes before plan-time stabilizes — min-of-2
    # still carried 1-3 s of warmup across the workload. The DuckDB
    # crossover side runs the same rep count (tools/crossover.py), so
    # the comparison stays symmetric; the protocol is declared in the
    # rep_protocol output field.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    load_start = os.getloadavg()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, fn in selected:
        try:
            c, best, _ = _measure(fn, spark, sf_dir, reps)
            cold[name] = round(c, 4)
            timings[name] = round(best, 4)
        except Exception as exc:  # a failing query must not kill the bench
            timings[name] = -1.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)

    # End-of-sweep outlier pass (r11 verdict item 1): a query whose warm
    # min exceeds its committed reference (crossover / BENCH_DETAIL,
    # same sf) by >3× was likely measured through a transient load
    # spike; re-measure it now — the end of the sweep is an independent
    # sample in time — and take the min. The re-run can only LOWER a
    # reading, never raise one, and every re-run is recorded in the
    # artifact (outlier_rerun) so a record that still reads high is
    # visibly a repeated, not one-off, measurement.
    here = os.path.dirname(os.path.abspath(__file__))
    refs = _reference_timings(here, sf)
    rerun: list[str] = []
    for name, fn in selected:
        t, ref = timings.get(name, -1.0), refs.get(name)
        if t >= 0 and ref and t > 3 * ref and t - ref > 0.25:
            try:
                _, best, _ = _measure(fn, spark, sf_dir, reps=3)
                rerun.append(name)
                if best < t:
                    timings[name] = round(best, 4)
            except Exception as exc:
                print(f"outlier rerun failed for {name}: {exc}",
                      file=sys.stderr)

    ok = {k: v for k, v in timings.items() if v >= 0}
    oracle_names = set(workload.ORACLES)
    out = {
        "metric": "workload_wall_time",
        "value": round(sum(ok.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # breakdown: the DuckDB-comparable relational subset vs the
        # pipeline operators DuckDB has no counterpart for (PERF.md)
        "oracle_subset_sec": round(
            sum(v for k, v in ok.items() if k in oracle_names), 4
        ),
        "pipeline_subset_sec": round(
            sum(v for k, v in ok.items() if k not in oracle_names), 4
        ),
        # Measurement definition, recorded so cross-round totals stay
        # interpretable (changed in round 5): rep 1 pays query
        # construction (transpile, DataFrame build, driver-side fits);
        # reps 2+ reuse the built DataFrame, so min-of-reps measures the
        # analyzed-plan steady state. `cold_sec` below is the sum of the
        # FIRST-rep times — the single-shot cold number rounds 2-3
        # reported — kept alongside for trend comparison.
        "rep_protocol": (
            f"min-of-{reps - 1}-warm (+up to 3 on >2x spread), rep1 cold "
            "excluded (cold_sec), end-of-sweep rerun of >3x-vs-reference "
            "outliers"
            if reps > 1
            else "single rep, cold"
        ),
        # queries re-measured by the end-of-sweep outlier pass (empty on
        # a clean box; non-empty means the box degraded mid-run and the
        # recorded values are the min over two independent samples)
        "outlier_rerun": sorted(rerun),
        # 1/5/15-min load averages at bench start and end: a reading
        # taken under box load is not comparable across rounds (the r10
        # crossover's sf1 sweep was uniformly ~1.8x inflated by
        # contamination; this field makes that visible in the artifact)
        "load_avg_start": [round(x, 2) for x in load_start],
        "load_avg_end": [round(x, 2) for x in os.getloadavg()],
        # a query that failed on a LATER rep keeps a cold[] entry but a
        # -1 timing — exclude it so cold_sec stays consistent with
        # `failed` (ADVICE r6)
        "cold_sec": round(
            sum(v for k, v in cold.items() if v >= 0 and timings.get(k, -1) >= 0),
            4,
        ),
    }
    # Full per-query detail goes to a file; the stdout JSON line must
    # stay under the driver's 2000-char stdout-tail capture or it
    # records parsed=null (rounds 1 and 2 both hit this). The line keeps
    # the headline metrics plus the slowest queries, shedding entries
    # until it fits.
    out["n_queries"] = len(timings)
    out["failed"] = sorted(k for k, v in timings.items() if v < 0)
    # Scale trend from the LATEST committed crossover artifact
    # (min-of-process-runs Spark/DuckDB ratios — see the matching
    # CROSSOVER_r*.json for raw numbers and methodology). Detail-file
    # only since r15: the stdout line spends its chars on per-query
    # entries.
    try:
        import glob as _glob
        import re as _re

        _here = os.path.dirname(os.path.abspath(__file__))

        def _xround(path):
            # numeric round order, not lexicographic ("r10" > "r2")
            m = _re.search(r"CROSSOVER_r(\d+)", os.path.basename(path))
            return int(m.group(1)) if m else -1

        latest = max(
            _glob.glob(os.path.join(_here, "CROSSOVER_r*.json")),
            key=_xround,
            default=None,
        )
        if latest:
            with open(latest) as fh:
                key = os.path.splitext(os.path.basename(latest))[0].lower()
                out[key] = json.load(fh)["ratio_spark_over_duckdb"]
    except (OSError, KeyError, ValueError):
        pass
    # A SPARK_GRAFT_QUERIES-restricted run must not clobber the committed
    # full-sweep detail file — it now feeds the outlier-pass references.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_DETAIL_partial.json" if names else "BENCH_DETAIL.json",
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    except OSError as exc:
        print(f"bench detail write failed: {exc}", file=sys.stderr)
    # LEAN stdout envelope (r15, r14 verdict item 1): every char spent on
    # envelope prose is a per-query entry that falls off the driver's
    # 2000-char tail. The line keeps the contract fields plus the
    # honesty-critical run context (failures, outlier reruns, 1-min load
    # at start/end — the contamination tell); protocol prose, subsets,
    # cold_sec and the crossover trend stay in BENCH_DETAIL.json (the
    # full `out` above), which the sweep commits alongside.
    line_out = {
        "metric": out["metric"],
        "value": round(out["value"], 2),
        "unit": out["unit"],
        "queries": timings,
        "sf": out["sf"],
        "failed": sorted(k for k, v in timings.items() if v < 0),
        "load": [
            round(load_start[0], 2), round(os.getloadavg()[0], 2)
        ],
    }
    if rerun:
        line_out["outlier_rerun"] = sorted(rerun)
    print(shed_to_fit(line_out, timings))
    spark.stop()


if __name__ == "__main__":
    main()

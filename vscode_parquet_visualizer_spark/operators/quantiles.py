"""Distributed EXACT quantiles (``quantile_cont`` parity) without the
per-group value buffer.

Spark's built-in exact ``percentile`` aggregate materializes EVERY value
of a group inside one aggregation buffer (ObjectHashAggregate) — with a
handful of groups that is the whole column in one task's memory, an OOM
at 100-TB scale (the reference delegates quantiles straight to DuckDB,
which has the same single-node luxury: src/duckdb-backend.ts:142-146
runs the user SQL verbatim). ``percentile_approx`` is sketch-based and
NOT exact.

This operator computes exact interpolated quantiles with bounded memory
everywhere, using iterative range refinement (distributed selection via
histograms):

1. per-group ``count/min/max`` — either a partial-aggregated scan, or
   FREE when the caller passes global ``bounds`` (e.g. parquet footer
   statistics, ``metadata.parquet_column_bounds``): then the first
   histogram pass doubles as group discovery (per-group ``n`` = sum of
   its bin counts) and the stats scan is skipped entirely;
2. per unresolved search interval, a histogram scan: bucket the
   interval's values into ``buckets`` equal-width bins. Interval
   membership + bin index are ONE constant-folded CASE expression when
   there are few live intervals (the common case — no join, whole-stage
   codegen keeps the scan pure JVM; the IVF-centroid lesson), falling
   back to a broadcast range-join above ``_EXPR_INTERVALS``. The driver
   walks cumulative bin counts to find each rank's bin and shrinks that
   rank's interval to the bin. A bin with ``min == max`` IS the answer
   (heavy-tie fast path). Ranks sharing an interval are coalesced, and
   intervals within a group are always pairwise disjoint (they descend
   from disjoint bins), so no source row ever feeds two intervals.
   Each pass divides candidates by ~``buckets``;
3. a final scan collects the few remaining candidate values per
   interval (``<= candidate_limit``) and indexes the order statistic.
   The narrow value-range filter is sargable — parquet zone maps / in-
   memory batch stats prune most of the scan.

Every scan is embarrassingly parallel (no global sort, no per-group
single-partition window); driver state is ``O(groups x ranks)``
scalars. Interpolation matches Spark ``percentile`` / DuckDB
``quantile_cont``: ``pos = q*(n-1); lo + (pos - floor(pos))*(hi - lo)``
in double.

Groups whose values are entirely NULL are omitted (same as grouping on
the non-null subset); values are compared as doubles — exact for the
<= 15-significant-digit decimals in the workload.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# above this many live intervals the CASE expression tree stops being
# codegen-friendly (the IVF k>=1024 literal cliff) — use the join path
_EXPR_INTERVALS = 64


def exact_quantiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    qs: list[float],
    buckets: int = 4096,
    candidate_limit: int = 65536,
    max_iters: int = 12,
    bounds: tuple[float, float] | None = None,
) -> list[dict]:
    """Per-group exact interpolated quantiles of ``col``.

    Returns a list of dicts ``{**group_keys, q: value, ...}`` (one per
    group, quantile keys are the float ``q`` values) — small driver-side
    data (``O(groups)``), computed from fully distributed scans. The
    caller shapes it into a DataFrame. ``bounds``: optional global
    (min, max) hint (parquet footer stats) that eliminates the stats
    scan; it must COVER all values but need not be tight.
    """
    spark = df.sparkSession
    src = (
        df.select(*keys, F.col(col).cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
    )
    key_schema = [
        (f.name, f.dataType.simpleString())
        for f in src.schema.fields
        if f.name != "__v"
    ]

    def _bucket(lo, hi):
        w = (hi - lo) / buckets
        return F.least(
            F.lit(buckets - 1), F.floor((F.col("__v") - F.lit(lo)) / F.lit(w))
        )

    # ---- pass 1: per-group n/min/max (or histogram-discovery) --------
    meta: dict[tuple, int] = {}
    state: dict[tuple, tuple] = {}  # (key, rank) -> (lo, hi, off, cnt)
    resolved: dict[tuple, float] = {}
    first_hist: dict[tuple, list] | None = None
    if bounds is not None and bounds[0] < bounds[1]:
        glo, ghi = float(bounds[0]), float(bounds[1])
        rows = (
            src.groupBy(*keys, _bucket(glo, ghi).alias("__b"))
            .agg(
                F.count("__v").alias("__c"),
                F.min("__v").alias("__bmn"),
                F.max("__v").alias("__bmx"),
            )
            .collect()
        )
        first_hist = {}
        for row in rows:
            first_hist.setdefault(
                tuple(row[k] for k in keys), []
            ).append(row)
        stats = [
            {
                **dict(zip(keys, key)),
                "__n": sum(r["__c"] for r in rows_),
                "__mn": min(r["__bmn"] for r in rows_),
                "__mx": max(r["__bmx"] for r in rows_),
            }
            for key, rows_ in first_hist.items()
        ]
    else:
        stats = (
            src.groupBy(*keys)
            .agg(
                F.count("__v").alias("__n"),
                F.min("__v").alias("__mn"),
                F.max("__v").alias("__mx"),
            )
            .collect()
        )

    def _advance(key, ranks, hist_rows, off0):
        """Walk one interval's sorted bins, placing each target rank."""
        rows = sorted(hist_rows, key=lambda r: r["__b"])
        for rank in ranks:
            cum = off0
            for row in rows:
                if cum + row["__c"] > rank:
                    if row["__bmn"] == row["__bmx"]:
                        resolved[(key, rank)] = row["__bmn"]
                    else:
                        state[(key, rank)] = (
                            row["__bmn"], row["__bmx"], cum, row["__c"],
                        )
                    break
                cum += row["__c"]

    for r in stats:
        key = tuple(r[k] for k in keys)
        n, mn, mx = r["__n"], r["__mn"], r["__mx"]
        ranks = set()
        for q in qs:
            p = q * (n - 1)
            ranks.add(math.floor(p))
            ranks.add(math.ceil(p))
        meta[key] = n
        if mn == mx:
            for rank in ranks:
                resolved[(key, rank)] = mn
        elif first_hist is not None:
            _advance(key, sorted(ranks), first_hist[key], 0)
        else:
            for rank in ranks:
                state[(key, rank)] = (mn, mx, 0, n)

    # ---- refinement loop ---------------------------------------------
    def _intervals(limit_only: bool) -> dict[tuple, list[int]]:
        out: dict[tuple, list[int]] = {}
        for (key, rank), (lo, hi, off, cnt) in state.items():
            if (key, rank) in resolved:
                continue
            if limit_only and cnt <= candidate_limit:
                continue
            out.setdefault((key, lo, hi, off), []).append(rank)
        return out

    def _key_eq(col_of, key):
        return [
            col_of(k).eqNullSafe(F.lit(kv).cast(t))
            for (k, t), kv in zip(key_schema, key)
        ]

    def _tagged(intervals, with_bucket: bool):
        """(iid, bucket?) tagged source rows for the live intervals.

        Expression path (few intervals): interval membership is a
        chained CASE — constant-folded, stays inside WholeStageCodegen,
        no join. Join path (many intervals): broadcast range-join.
        Sound either way because a group's live intervals are disjoint.
        """
        ikeys = list(intervals)
        if len(ikeys) <= _EXPR_INTERVALS:
            iid = F.lit(None).cast("int")
            bk = F.lit(None).cast("bigint")
            for i in range(len(ikeys) - 1, -1, -1):
                key, lo, hi, _off = ikeys[i]
                cond = F.lit(True)
                for c in _key_eq(F.col, key) + [
                    F.col("__v") >= lo, F.col("__v") <= hi
                ]:
                    cond = cond & c
                iid = F.when(cond, F.lit(i)).otherwise(iid)
                if with_bucket:
                    bk = F.when(cond, _bucket(lo, hi)).otherwise(bk)
            cols = [iid.alias("__iid")] + (
                [bk.alias("__b")] if with_bucket else []
            )
            return ikeys, src.select("__v", *cols).filter(
                F.col("__iid").isNotNull()
            )
        fields = ", ".join(
            [f"`{k}` {t}" for k, t in key_schema]
            + ["__lo double", "__hi double", "__iid int"]
        )
        bdf = F.broadcast(
            spark.createDataFrame(
                [
                    tuple(key) + (float(lo), float(hi), i)
                    for i, (key, lo, hi, _off) in enumerate(ikeys)
                ],
                fields,
            )
        )
        j = src.join(
            bdf,
            [src[k].eqNullSafe(bdf[k]) for k in keys]
            + [src["__v"] >= bdf["__lo"], src["__v"] <= bdf["__hi"]],
        )
        cols = [bdf["__iid"]]
        if with_bucket:
            w = (F.col("__hi") - F.col("__lo")) / F.lit(buckets)
            cols.append(
                F.least(
                    F.lit(buckets - 1),
                    F.floor((F.col("__v") - F.col("__lo")) / w),
                ).alias("__b")
            )
        return ikeys, j.select(src["__v"], *cols)

    for _ in range(max_iters):
        intervals = _intervals(limit_only=True)
        if not intervals:
            break
        ikeys, tagged = _tagged(intervals, with_bucket=True)
        hist = (
            tagged.groupBy("__iid", "__b")
            .agg(
                F.count("__v").alias("__c"),
                F.min("__v").alias("__bmn"),
                F.max("__v").alias("__bmx"),
            )
            .collect()
        )
        per_iid: dict[int, list] = {}
        for row in hist:
            per_iid.setdefault(row["__iid"], []).append(row)
        for iid, ikey in enumerate(ikeys):
            key, _lo, _hi, off = ikey
            _advance(key, intervals[ikey], per_iid.get(iid, ()), off)

    # ---- candidate collection ----------------------------------------
    intervals = _intervals(limit_only=False)
    if intervals:
        # Refinement can stall at max_iters with an interval still far
        # above candidate_limit (pathological distributions); collecting
        # it would buffer unbounded rows on the driver. The live counts
        # are already known from `state` — fail loudly instead.
        hard_cap = 8 * candidate_limit
        for (key, _lo, _hi, _off), ranks in intervals.items():
            cnt = state[(key, ranks[0])][3]
            if cnt > hard_cap:
                raise RuntimeError(
                    f"exact_quantiles: group {key} still holds {cnt} "
                    f"candidate rows after max_iters={max_iters} "
                    f"refinement rounds (candidate_limit="
                    f"{candidate_limit}); raise max_iters or "
                    "candidate_limit"
                )
        ikeys, tagged = _tagged(intervals, with_bucket=False)
        cands = (
            tagged.groupBy("__iid")
            .agg(F.sort_array(F.collect_list("__v")).alias("__vs"))
            .collect()
        )
        by_iid = {row["__iid"]: row["__vs"] for row in cands}
        for iid, ikey in enumerate(ikeys):
            key, _lo, _hi, off = ikey
            vs = by_iid.get(iid)
            if vs is None:
                # zero matches would mean the histogram's bucket bounds
                # and the range filter disagree on this interval —
                # surface it rather than KeyError deep in rank lookup
                raise RuntimeError(
                    f"exact_quantiles: interval {ikey} matched no rows "
                    "at candidate collection (histogram/range-filter "
                    "bound drift)"
                )
            for rank in intervals[ikey]:
                resolved[(key, rank)] = vs[rank - off]

    # ---- interpolate -------------------------------------------------
    out = []
    for key, n in meta.items():
        d = dict(zip(keys, key))
        for q in qs:
            p = q * (n - 1)
            lo_v = resolved[(key, math.floor(p))]
            hi_v = resolved[(key, math.ceil(p))]
            d[q] = lo_v + (p - math.floor(p)) * (hi_v - lo_v)
        out.append(d)
    return out

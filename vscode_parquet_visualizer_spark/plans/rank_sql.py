"""Route pass-through rank-family window SQL around WindowExec's wall.

The reference passes the query tab's text verbatim to its engine
(src/worker.ts:516-541 → src/duckdb-backend.ts:142-146), so a user
typing ``rank() OVER (PARTITION BY low_card_key ORDER BY …)`` over a
big table expects it to run. On Spark that text plans as WindowExec,
which places EVERY row of a window partition on ONE task — over a
3-value key at 100 TB the query simply does not run (operators/rank.py
module docstring has the measurements). This module detects that shape
in the gateway and lowers it onto the distributed rank operator:

- shape: a single SELECT (no GROUP BY / HAVING / QUALIFY / DISTINCT /
  set ops) whose window functions are all computable from a global row
  number or a per-partition aggregate — rank, dense_rank,
  percent_rank, cume_dist, row_number, ntile, first/last/nth_value
  with default or unbounded-both frames, lag/lead (ghost-row blocked
  window, operators/rank.py), and whole-partition sum/avg/min/max/
  count (no ORDER BY or unbounded frame) — and share ONE
  (PARTITION BY, ORDER BY) over plain column references;
- gate: the child input must be above ``_size_gate()`` AND the
  partition key's NDV (measured over a bounded, limit-pushed probe) at
  most ``4 × parallelism`` (a high-NDV key gives WindowExec plenty of
  parallel tasks — the wall only exists when key cardinality < cores).
  Families whose distributed shape measures SLOWER at local scale
  (lag/lead, running aggregates) additionally require either
  ``SPARK_GRAFT_RANK=distributed`` or an estimated
  bytes-per-window-partition above the single-task budget
  (``SPARK_GRAFT_TASK_BUDGET``, default 8 GiB) — at that size the
  WindowExec plan would not finish at all, so auto mode routes
  regardless of the local-scale measurement.
  ``SPARK_GRAFT_RANK=distributed`` forces the route at any size (how
  the tests pin it); ``=window`` disables it.
- otherwise: when the gate would fire but the shape has something the
  lowering doesn't cover, emit a loud RuntimeWarning naming the wall
  instead of silently planning a query that won't finish.

The lowering executes the FROM/WHERE through the normal gateway
(dialect-complete), attaches the window results via
operators.rank.attach_window_columns (tie-correct rank/dense_rank —
no total-order assumption), registers the result as a temp view, and
re-runs the outer select with each window call textually replaced by
its computed column, so wrappers like ``CAST(rank() OVER w AS BIGINT)``
or ``round(percent_rank() OVER w, 6)`` keep working unchanged.
"""

from __future__ import annotations

import itertools
import os
import re
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vscode_parquet_visualizer_spark.plans.dialect import (
    _protect_literals,
    _restore_literals,
    _split_top_level,
)

_SIZE_GATE = 64 * 1024 * 1024


def _size_gate() -> int:
    """Child-size floor below which the plain WindowExec plan is kept
    (small interactive inputs). Env-overridable so routing tests can
    exercise the scale behavior on small fixtures."""
    return int(os.environ.get("SPARK_GRAFT_RANK_SIZE_GATE", _SIZE_GATE))

_RANK_FNS = {
    "rank",
    "dense_rank",
    "percent_rank",
    "cume_dist",
    "row_number",
    "ntile",
    "first_value",
    "last_value",
    "nth_value",
    "lag",
    "lead",
}
_NO_ARG = {"rank", "dense_rank", "percent_rank", "cume_dist", "row_number"}
# whole-partition aggregates: lowered to groupBy + broadcast attach when
# the spec has no ORDER BY (or an unbounded-both frame); with an order
# and the default frame they are CUMULATIVE — not lowered (warned)
_PAGG_FNS = {"sum", "avg", "min", "max", "count"}

_QUICK = re.compile(
    r"\b(" + "|".join(sorted(_RANK_FNS | _PAGG_FNS)) + r")\s*\(",
    re.IGNORECASE,
)

_CLAUSE_KWS = (
    "FROM",
    "WHERE",
    "GROUP",
    "HAVING",
    "QUALIFY",
    "WINDOW",
    "ORDER",
    "LIMIT",
    "OFFSET",
    "FETCH",
    "UNION",
    "INTERSECT",
    "EXCEPT",
)
_CLAUSE_RE = re.compile(r"(?:" + "|".join(_CLAUSE_KWS) + r")\b", re.IGNORECASE)

_COLREF = re.compile(r"[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?")

_view_ids = itertools.count()

# Gate-probe caches, keyed by the child SQL text: the size probe costs
# one plan analysis (~tens of ms) and the NDV probe one pruned-scan job
# — paid once per distinct query text, not per repetition. Any catalog
# change (DDL, dataset open) clears them via note_catalog_change() —
# the same child text can resolve to different data after a view is
# re-registered, and a stale probe would mis-ROUTE it (round-13 ADVICE
# item 5; routing only — results were never affected).
_SIZE_CACHE: dict[str, int] = {}
_NDV_CACHE: dict[tuple[str, tuple], int] = {}
_CACHE_MAX = 256


def note_catalog_change() -> None:
    """Invalidate the gate-probe caches; called by the DDL router and
    the engine whenever a relation is (re)registered."""
    _SIZE_CACHE.clear()
    _NDV_CACHE.clear()


def _mode() -> str:
    return os.environ.get("SPARK_GRAFT_RANK", "auto").lower()


def _top_level_clauses(s: str) -> list[tuple[str, int]]:
    """(KEYWORD, position) for each top-level clause keyword, in order."""
    out: list[tuple[str, int]] = []
    depth = 0
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and (ch.isalpha() or ch == "_"):
            if i == 0 or not (s[i - 1].isalnum() or s[i - 1] in "_."):
                m = _CLAUSE_RE.match(s, i)
                if m:
                    out.append((m.group(0).upper(), i))
                    i = m.end()
                    continue
            # skip the rest of this identifier
            while i < len(s) and (s[i].isalnum() or s[i] == "_"):
                i += 1
            continue
        i += 1
    return out


def _subquery_spans(s: str) -> list[tuple[int, int]]:
    """Spans of every parenthesized subquery ``( SELECT … )`` in ``s``
    (literals are already stashed by the caller, so a ``(SELECT`` here
    is always real SQL). Used to refuse OVER occurrences that belong to
    a scalar subquery in the select list — lowering those would compute
    the window over the OUTER child and splice the result column into
    the subquery, silently wrong (round-13 ADVICE item 1)."""
    spans = []
    for m in re.finditer(r"\(\s*SELECT\b", s, re.IGNORECASE):
        depth, k = 1, m.end()
        while k < len(s) and depth:
            if s[k] == "(":
                depth += 1
            elif s[k] == ")":
                depth -= 1
            k += 1
        spans.append((m.start(), k))
    return spans


def _window_calls(sel: str):
    """Parse ``fn(args) OVER (spec | name)`` occurrences in a select
    list. Returns a list of dicts or None when anything fails to parse
    (the caller falls back to the normal path). Any OVER inside a
    parenthesized subquery aborts the whole parse: the call's window
    runs over the SUBQUERY's input, not the outer child, so the
    lowering does not apply (normal WindowExec path instead)."""
    sub_spans = _subquery_spans(sel)
    calls = []
    for m in re.finditer(r"\bOVER\b", sel, re.IGNORECASE):
        if any(lo < m.start() < hi for lo, hi in sub_spans):
            return None
        # forward: the window spec (inline parens or a named window)
        j = m.end()
        while j < len(sel) and sel[j].isspace():
            j += 1
        if j < len(sel) and sel[j] == "(":
            depth, k = 1, j + 1
            while k < len(sel) and depth:
                if sel[k] == "(":
                    depth += 1
                elif sel[k] == ")":
                    depth -= 1
                k += 1
            if depth:
                return None
            spec, end = ("INLINE", sel[j + 1 : k - 1]), k
        else:
            wm = re.match(r"[A-Za-z_]\w*", sel[j:])
            if not wm:
                return None
            spec, end = ("NAME", wm.group(0).lower()), j + wm.end()
        # backward: the function call directly before OVER
        i = m.start() - 1
        while i >= 0 and sel[i].isspace():
            i -= 1
        if i < 0 or sel[i] != ")":
            return None
        depth, i = 1, i - 1
        args_end = i + 1
        while i >= 0 and depth:
            if sel[i] == ")":
                depth += 1
            elif sel[i] == "(":
                depth -= 1
            i -= 1
        if depth:
            return None
        args = sel[i + 2 : args_end]
        fm = re.search(r"([A-Za-z_]\w*)\s*$", sel[: i + 1])
        if not fm:
            return None
        calls.append(
            {
                "start": fm.start(1),
                "end": end,
                "fn": fm.group(1).lower(),
                "args": args.strip(),
                "spec": spec,
            }
        )
    return calls


def _parse_spec(spec: str):
    """``PARTITION BY a, b ORDER BY x DESC, y [frame]`` →
    (partition_refs, [(order_ref, desc, nulls_first)], unbounded|None).
    Returns None for anything beyond plain column references or a
    non-unbounded explicit frame."""
    pm = re.search(r"\bPARTITION\s+BY\b", spec, re.IGNORECASE)
    om = re.search(r"\bORDER\s+BY\b", spec, re.IGNORECASE)
    fm = re.search(r"\b(ROWS|RANGE|GROUPS)\b", spec, re.IGNORECASE)
    if om is None and fm is not None:
        return None  # a frame without an order is malformed
    if pm is not None and om is not None and pm.start() > om.start():
        return None
    spec_end = len(spec)
    om_start = om.start() if om else (fm.start() if fm else spec_end)
    part_text = spec[pm.end() : om_start] if pm is not None else ""
    order_text = (
        spec[om.end() : fm.start() if fm else spec_end] if om else ""
    )
    frame_text = spec[fm.start() :].strip() if fm else ""
    head_end = pm.start() if pm is not None else om_start
    if spec[:head_end].strip():
        return None  # a named-window base reference etc.
    parts: list[str] = []
    for it in _split_top_level(part_text) if part_text.strip() else []:
        it = it.strip()
        if not _COLREF.fullmatch(it):
            return None
        parts.append(it.lower())
    orders: list[tuple[str, bool, bool]] = []
    for it in _split_top_level(order_text) if order_text.strip() else []:
        im = re.fullmatch(
            r"\s*(.*?)((?:\s+(?:ASC|DESC|NULLS\s+FIRST|NULLS\s+LAST))*)\s*",
            it,
            re.IGNORECASE | re.DOTALL,
        )
        body, sfx = im.group(1).strip(), im.group(2).upper()
        if not _COLREF.fullmatch(body):
            return None
        desc = "DESC" in sfx
        # DuckDB default null order: NULLS LAST in BOTH directions
        nulls_first = "NULLS FIRST" in re.sub(r"\s+", " ", sfx)
        orders.append((body.lower(), desc, nulls_first))
    if om is not None and not orders:
        return None
    frame = "default"
    if frame_text:
        ft = re.sub(r"\s+", " ", frame_text)
        if re.fullmatch(
            r"(ROWS|RANGE) BETWEEN UNBOUNDED PRECEDING AND "
            r"UNBOUNDED FOLLOWING",
            ft,
            re.IGNORECASE,
        ):
            frame = "unbounded"
        elif re.fullmatch(
            r"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            ft,
            re.IGNORECASE,
        ):
            frame = "cume_rows"
        elif re.fullmatch(
            r"RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            ft,
            re.IGNORECASE,
        ):
            frame = "cume_range"  # same as the default frame
        else:
            return None
    return tuple(parts), tuple(orders), frame


_FRAC_LL_QUICK = re.compile(r"\b(?:lag|lead)\s*\(", re.IGNORECASE)
_FRAC_NUM = re.compile(r"[+-]?(?:\d+\.\d+|\.\d+|\d+\.)")


def rewrite_fractional_lag_defaults(spark, sql: str, analyze) -> str:
    """Close the fractional lag/lead DEFAULT coercion divergence
    (recorded since r12; r14 verdict item 3). For an INTEGRAL value
    column, Spark coerces the default by TRUNCATING the literal
    (``lag(big, 1, 2.5)`` → default 2) where DuckDB casts its DECIMAL
    literal rounding half away from zero (2.5 → 3, −2.5 → −3) — the
    reference passes this SQL verbatim (src/worker.ts:516-541) and
    neither engine warns. Rewrite the literal to the rounded integer
    BEFORE Spark's implicit cast, for the WindowExec and lowered paths
    alike (this runs in the gateway ahead of both).

    The value type comes from a schema-only probe: the first argument
    is appended to the governing SELECT's item list under a marker
    alias and ``analyze`` (transpile + ``spark.sql``, no job) reports
    its type. Fractional-valued columns keep the fractional default
    (DuckDB keeps 2.5 for a DOUBLE column — verified differentially).
    Any probe failure (nested scopes where the marker does not surface,
    analysis errors) leaves the text unchanged — fail-open to today's
    recorded behavior, never a new wrong answer."""
    if not _FRAC_LL_QUICK.search(sql):
        return sql
    from decimal import ROUND_HALF_UP, Decimal

    prot, stash = _protect_literals(sql)

    def _depths(text: str) -> list[int]:
        out, d = [], 0
        for ch in text:
            if ch == "(":
                d += 1
            elif ch == ")":
                d = max(0, d - 1)
            out.append(d)
        return out

    depth = _depths(prot)
    calls = []  # (arg3 abs start, arg3 abs end, arg1 text, literal text)
    for m in re.finditer(r"\b(lag|lead)\s*\(", prot, re.IGNORECASE):
        i, d = m.end(), 1
        while i < len(prot) and d:
            if prot[i] == "(":
                d += 1
            elif prot[i] == ")":
                d -= 1
            i += 1
        if d:
            return sql  # unbalanced: bail out untouched
        args = prot[m.end() : i - 1]
        items = _split_top_level(args)
        if len(items) != 3:
            continue
        a3 = items[2].strip()
        if not _FRAC_NUM.fullmatch(a3):
            continue
        dec = Decimal(a3)
        if dec == dec.to_integral_value():
            continue  # x.0: truncation and rounding agree
        # absolute span of the third argument within ``prot``
        base, d2, commas = m.end(), 0, []
        for j, ch in enumerate(args):
            if ch == "(":
                d2 += 1
            elif ch == ")":
                d2 -= 1
            elif ch == "," and d2 == 0:
                commas.append(j)
        a3_start = base + commas[1] + 1
        calls.append((a3_start, base + len(args), items[0].strip(), a3, m.start()))
    if not calls:
        return sql
    from pyspark.sql import types as T

    # any top-level WITH prefix must travel with each branch probe so
    # CTE references keep resolving
    prefix = ""
    if re.match(r"\s*WITH\b", prot, re.IGNORECASE):
        for sm in re.finditer(r"\bSELECT\b", prot, re.IGNORECASE):
            if depth[sm.start()] == 0:
                prefix = prot[: sm.start()]
                break
    setop = re.compile(r"\b(?:UNION|INTERSECT|EXCEPT)\b", re.IGNORECASE)
    # probe each call SEPARATELY against its own set-op branch: a
    # single combined probe would merge branch probes positionally
    # under branch 1's alias (caught by composite_fuzz seed 1441)
    integral: list[bool] = []
    for k, (_, _, arg1, _, call_pos) in enumerate(calls):
        d = depth[call_pos]
        sel = None
        for sm in re.finditer(r"\bSELECT\b", prot, re.IGNORECASE):
            if sm.start() < call_pos and depth[sm.start()] == d:
                sel = sm
        if sel is None:
            integral.append(False)
            continue
        ins = len(prot)
        for cm in _CLAUSE_RE.finditer(prot, sel.end()):
            if depth[cm.start()] == d and cm.start() > call_pos:
                ins = cm.start()
                break
        end = len(prot)
        for om in setop.finditer(prot, ins):
            if depth[om.start()] == d:
                end = om.start()
                break
        probe = (
            prefix
            + prot[sel.start() : ins]
            + f", ({arg1}) AS __llprobe{k} "
            + prot[ins:end]
        )
        try:
            schema = analyze(
                _restore_literals(probe, stash, form="duck")
            ).schema
            integral.append(
                f"__llprobe{k}" in schema.names
                and isinstance(
                    schema[f"__llprobe{k}"].dataType, T.IntegralType
                )
            )
        except Exception:
            integral.append(False)  # fail-open: leave this call as-is
    out = prot
    for k, (a3s, a3e, _, a3, _) in sorted(
        enumerate(calls), key=lambda p: -p[1][0]
    ):
        if not integral[k]:
            continue
        rounded = str(
            Decimal(a3).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )
        out = out[:a3s] + " " + rounded + out[a3e:]
    return _restore_literals(out, stash, form="duck")


def try_rewrite_rank(
    spark: SparkSession, sql: str, run_sql, **kw
) -> DataFrame | None:
    mode = _mode()
    if mode == "window":
        return None
    if not re.search(r"\bOVER\b", sql, re.IGNORECASE) or not _QUICK.search(
        sql
    ):
        return None
    try:
        return _try_rewrite(spark, sql, run_sql, mode, kw)
    except Exception as exc:  # any lowering failure → normal path
        warnings.warn(
            f"distributed-rank lowering failed ({exc}); falling back to "
            "the WindowExec plan",
            RuntimeWarning,
            stacklevel=2,
        )
        return None


def _warn_wall(reason: str) -> None:
    warnings.warn(
        "rank-family window over a low-cardinality partition key plans "
        "as WindowExec (one task per window partition — does not scale); "
        f"the distributed lowering could not apply: {reason}",
        RuntimeWarning,
        stacklevel=3,
    )


def _try_rewrite(
    spark: SparkSession, sql: str, run_sql, mode: str, kw: dict
) -> DataFrame | None:
    from vscode_parquet_visualizer_spark.operators.rank import (
        attach_window_columns,
    )

    prot, stash = _protect_literals(sql.rstrip().rstrip(";"))
    sm = re.match(r"\s*SELECT\b(?!\s+DISTINCT\b)", prot, re.IGNORECASE)
    if sm is None:
        return None
    clauses = _top_level_clauses(prot[sm.end() :])
    clauses = [(k, p + sm.end()) for k, p in clauses]
    names = [k for k, _ in clauses]
    if "FROM" not in names:
        return None
    if {"GROUP", "HAVING", "QUALIFY", "UNION", "INTERSECT", "EXCEPT"} & set(
        names
    ):
        return None

    def _clause(kw_name: str) -> tuple[int, int] | None:
        for idx, (k, p) in enumerate(clauses):
            if k == kw_name:
                nxt = clauses[idx + 1][1] if idx + 1 < len(clauses) else len(
                    prot
                )
                return p, nxt
        return None

    f_span = _clause("FROM")
    sel_text = prot[sm.end() : f_span[0]]
    from_text = prot[f_span[0] + 4 : f_span[1]].strip()
    w_span = _clause("WHERE")
    where_text = prot[w_span[0] + 5 : w_span[1]].strip() if w_span else None
    win_span = _clause("WINDOW")
    # the trailing ORDER BY / LIMIT / OFFSET / FETCH text, kept verbatim
    tail_start = None
    for k, p in clauses:
        if k in ("ORDER", "LIMIT", "OFFSET", "FETCH"):
            tail_start = p
            break
    tail = prot[tail_start:] if tail_start is not None else ""
    if re.search(r"\bOVER\b", tail, re.IGNORECASE):
        return None  # window calls outside the select list: normal path

    named: dict[str, str] = {}
    if win_span:
        for item in _split_top_level(prot[win_span[0] + 6 : win_span[1]]):
            wm = re.fullmatch(
                r"\s*([A-Za-z_]\w*)\s+AS\s*\((.*)\)\s*",
                item,
                re.IGNORECASE | re.DOTALL,
            )
            if wm is None:
                return None
            named[wm.group(1).lower()] = wm.group(2)

    calls = _window_calls(sel_text)
    if not calls:
        return None
    if not any(c["fn"] in (_RANK_FNS | _PAGG_FNS) for c in calls):
        return None

    shared = None
    specs_parsed = []
    for c in calls:
        kind, val = c["spec"]
        spec_text = named.get(val) if kind == "NAME" else val
        if spec_text is None:
            return None
        parsed = _parse_spec(spec_text)
        if parsed is None:
            _maybe_warn_gated(spark, run_sql, from_text, where_text, stash,
                              kw, mode, "unsupported window spec")
            return None
        if shared is None:
            shared = parsed[:2]
        elif parsed[:2] != shared:
            _maybe_warn_gated(spark, run_sql, from_text, where_text, stash,
                              kw, mode, "multiple distinct window specs")
            return None
        specs_parsed.append(parsed)

    # per-call support check → output specs
    outputs: dict[str, tuple] = {}
    call_out: list[str] = []
    keyed: dict[tuple, str] = {}
    for c, parsed in zip(calls, specs_parsed):
        fn, args, frame = c["fn"], c["args"], parsed[2]
        unbounded = frame == "unbounded"
        has_order = bool(parsed[1])
        if fn not in (_RANK_FNS | _PAGG_FNS) or re.search(
            r"\b(IGNORE|RESPECT)\s+NULLS\b", args, re.IGNORECASE
        ):
            _maybe_warn_gated(spark, run_sql, from_text, where_text, stash,
                              kw, mode, f"unsupported function {fn}")
            return None
        if fn in _PAGG_FNS:
            if fn == "count" and args.strip() == "*":
                ref = None
            else:
                items = _split_top_level(args)
                ref = items[0].strip() if items else ""
                if len(items) != 1 or not _COLREF.fullmatch(ref):
                    _maybe_warn_gated(spark, run_sql, from_text,
                                      where_text, stash, kw, mode,
                                      f"non-column argument to {fn}")
                    return None
            if not has_order or unbounded:
                spec = ("pagg", fn, ref)
            else:
                # ORDER BY + default/cumulative frame: distributed
                # segmented prefix (ROWS frame is row-level; the
                # default and RANGE frames are tie-inclusive)
                spec = ("ragg", fn, ref, frame == "cume_rows")
        elif not has_order:
            return None  # rank family without ORDER BY: engine error
        elif fn in _NO_ARG:
            if args:
                return None
            spec = (fn,)
        elif fn == "ntile":
            if not re.fullmatch(r"\d+", args) or int(args) < 1:
                return None
            spec = ("ntile", int(args))
        elif fn in ("lag", "lead"):
            items = _split_top_level(args)
            ref = items[0].strip() if items else ""
            if not (1 <= len(items) <= 3) or not _COLREF.fullmatch(ref):
                _maybe_warn_gated(spark, run_sql, from_text, where_text,
                                  stash, kw, mode,
                                  f"non-column argument to {fn}")
                return None
            off = 1
            if len(items) >= 2:
                if not re.fullmatch(r"\d+", items[1].strip()):
                    return None
                off = int(items[1])
            default = None
            if len(items) == 3:
                ok, default = _literal_value(items[2], stash)
                if not ok:
                    return None
            spec = (fn, ref, off, default)
        else:
            items = _split_top_level(args)
            ref = items[0].strip() if items else ""
            if not _COLREF.fullmatch(ref):
                _maybe_warn_gated(spark, run_sql, from_text, where_text,
                                  stash, kw, mode,
                                  f"non-column argument to {fn}")
                return None
            if fn == "first_value":
                if len(items) != 1:
                    return None
                spec = ("first_value", ref)
            elif fn == "last_value":
                if len(items) != 1:
                    return None
                spec = ("last_value", ref, unbounded)
            else:  # nth_value
                if len(items) != 2 or not re.fullmatch(
                    r"\d+", items[1].strip()
                ):
                    return None
                spec = ("nth_value", ref, int(items[1]), unbounded)
        key = (spec, parsed)
        if key not in keyed:
            out = f"__wf{len(keyed)}"
            keyed[key] = out
            outputs[out] = spec
        call_out.append(keyed[key])

    part_refs, order_refs = shared
    child_sql = _child_sql(from_text, where_text, stash)
    child_df = None
    if mode != "distributed":
        size = _SIZE_CACHE.get(child_sql)
        if size is None:
            child_df = _run_child(spark, run_sql, child_sql, kw)
            size = _plan_bytes(child_df)
            if len(_SIZE_CACHE) < _CACHE_MAX:
                _SIZE_CACHE[child_sql] = size
        if size < _size_gate():
            return None
        ndv = _NDV_CACHE.get((child_sql, part_refs))
        if ndv is None:
            if child_df is None:
                child_df = _run_child(spark, run_sql, child_sql, kw)
            ndv = _measure_ndv(child_df, part_refs)
            if ndv is not None and len(_NDV_CACHE) < _CACHE_MAX:
                _NDV_CACHE[(child_sql, part_refs)] = ndv
        if ndv is None or ndv > max(
            64, 4 * spark.sparkContext.defaultParallelism
        ):
            # a high-NDV key gives WindowExec plenty of parallel tasks —
            # the wall only exists when key cardinality < cores
            return None
        # auto-route policy, measured at sf10 (15 M rows, 3-value key,
        # local[32]; PERF.md): rank-family 13.5→1.3 s and
        # whole-partition aggregates 3.8→1.1 s WIN and route
        # automatically; lag/lead (2.6 s WindowExec vs 7.2 s ghost-row
        # blocked window — down from the r12 self-join's 10.7 s) and
        # running aggregates (4.1→24 s) still lose at single-node
        # scale, because with_row_numbers' range-sort + checkpoint
        # alone costs more than the whole local WindowExec — so they
        # are OPT-IN (SPARK_GRAFT_RANK=distributed) — UNLESS the
        # estimated bytes-per-window-partition exceeds what one task
        # can hold at all (size ÷ NDV > SPARK_GRAFT_TASK_BUDGET, default
        # 8 GiB): then WindowExec does not finish regardless of the
        # local-scale measurement, and auto mode routes anyway
        # (round-12 verdict item 1a).
        optin = sorted(
            {s[0] for s in outputs.values()} & {"lag", "lead", "ragg"}
        )
        if optin:
            bpp = size / max(ndv, 1)
            if bpp <= _task_budget():
                _warn_wall(
                    f"{'/'.join(optin)} lowering is opt-in "
                    "(SPARK_GRAFT_RANK=distributed) — slower than "
                    "WindowExec below cluster scale, and the estimated "
                    f"{bpp / 1e6:.0f} MB per window partition still fits "
                    "one task"
                )
                return None
            warnings.warn(
                "auto-routing the distributed "
                f"{'/'.join(optin)} lowering: estimated "
                f"{bpp / 1e9:.1f} GB per window partition exceeds the "
                f"single-task budget ({_task_budget() / 1e9:.1f} GB) — "
                "the WindowExec plan would not finish",
                RuntimeWarning,
                stacklevel=4,
            )
    if child_df is None:
        child_df = _run_child(spark, run_sql, child_sql, kw)

    # resolve refs (case-insensitive, strip any qualifier) against the
    # child's actual column names
    by_lower = {c.lower(): c for c in child_df.columns}

    # COLUMN PRUNING through the lowering (r13): WindowExec's plan gets
    # Catalyst pruning for free — only the selected + window-key
    # columns cross its exchange. The lowering materializes the child
    # eagerly, so it must prune by hand or every shuffle in the rank
    # operator carries the full row (measured 2× on a 9-column fact
    # table whose query selects 3). Keep a child column iff its
    # (lowercased, unqualified) name appears as an identifier in the
    # rewritten select list / tail, or it is a window key/argument; a
    # ``*`` anywhere keeps everything.
    outer_text = re.sub(
        r"count\s*\(\s*\*\s*\)", "count_star_", sel_text + " " + tail,
        flags=re.IGNORECASE,
    )  # count(*)'s star is not a projection star
    if "*" not in outer_text:
        idents = {
            m.group(0).split(".")[-1].lower()
            for m in re.finditer(r"[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?",
                                 outer_text)
        }
        # Quoted identifiers travel as \x00IDQn\x00 / \x00BTKn\x00
        # placeholders at this stage (r14 ADVICE): a child column
        # referenced only as "My Col" would otherwise be pruned and the
        # rewritten outer SELECT would fail unresolved. Restore each
        # placeholder's inner name into the keep-set.
        for m in re.finditer(r"\x00(IDQ|BTK)(\d+)\x00", outer_text):
            lit = stash[int(m.group(2))]
            inner = (
                lit[1:-1].replace('""', '"')
                if m.group(1) == "IDQ"
                else lit[1:-1].replace("``", "`")
            )
            idents.add(inner.split(".")[-1].lower())
        for c in calls:  # window args resolve below; keep them too
            idents.update(
                m.group(0).split(".")[-1].lower()
                for m in re.finditer(r"[A-Za-z_]\w*", c["args"])
            )
        idents.update(r.split(".")[-1] for r in part_refs)
        idents.update(r.split(".")[-1] for r, _, _ in order_refs)
        keep = [c for c in child_df.columns if c.lower() in idents]
        if keep and len(keep) < len(child_df.columns):
            child_df = child_df.select(*keep)
            by_lower = {c.lower(): c for c in child_df.columns}

    def _resolve(ref: str) -> str | None:
        return by_lower.get(ref) or by_lower.get(ref.split(".")[-1])

    partition_cols = [_resolve(r) for r in part_refs]
    order_cols = [_resolve(r) for r, _, _ in order_refs]
    if None in partition_cols or None in order_cols:
        _warn_wall("window keys are not child columns")
        return None
    resolved_outputs: dict[str, tuple] = {}
    for out, spec in outputs.items():
        if spec[0] in ("first_value", "last_value", "nth_value", "lag",
                       "lead"):
            vc = _resolve(spec[1])
            if vc is None:
                _warn_wall(f"{spec[0]} argument is not a child column")
                return None
            spec = (spec[0], F.col(vc)) + spec[2:]
        elif spec[0] in ("pagg", "ragg") and spec[2] is not None:
            vc = _resolve(spec[2])
            if vc is None:
                _warn_wall(f"{spec[1]} argument is not a child column")
                return None
            spec = (spec[0], spec[1], F.col(vc)) + spec[3:]
        resolved_outputs[out] = spec

    lowered = attach_window_columns(
        child_df,
        partition_cols,
        order_cols,
        [(d, nf) for _, d, nf in order_refs],
        resolved_outputs,
    )
    view = f"__rank_lowered_{next(_view_ids)}"
    lowered.createOrReplaceTempView(view)

    new_sel = sel_text
    for c, out in sorted(
        zip(calls, call_out), key=lambda p: -p[0]["start"]
    ):
        new_sel = new_sel[: c["start"]] + out + new_sel[c["end"] :]
    new_sql = f"SELECT {new_sel.strip()} FROM {view}"
    if tail:
        new_sql += " " + tail
    try:
        return run_sql(
            spark, _restore_literals(new_sql, stash, form="duck"), **kw
        )
    finally:
        # spark.sql analyzes eagerly, so the returned DataFrame no
        # longer needs the catalog entry — drop it instead of leaking
        # one view per lowering for the session lifetime.
        spark.catalog.dropTempView(view)


def _literal_value(text: str, stash: list[str]):
    """(ok, value) for a simple literal argument (lag/lead defaults):
    integers, decimals, NULL, and stashed single-quoted strings."""
    t = text.strip()
    if re.fullmatch(r"-?\d+", t):
        return True, int(t)
    if re.fullmatch(r"-?\d+\.\d+", t):
        return True, float(t)
    if re.fullmatch(r"NULL", t, re.IGNORECASE):
        return True, None
    m = re.fullmatch(r"\x00LIT(\d+)\x00", t)
    if m:
        raw = stash[int(m.group(1))]
        if raw.startswith("'") and raw.endswith("'"):
            return True, raw[1:-1].replace("''", "'")
    return False, None


def _child_sql(from_text, where_text, stash) -> str:
    child_sql = f"SELECT * FROM {from_text}"
    if where_text:
        child_sql += f" WHERE {where_text}"
    return _restore_literals(child_sql, stash, form="duck")


def _run_child(spark, run_sql, child_sql, kw) -> DataFrame:
    return run_sql(spark, child_sql, **kw)


def _plan_bytes(df: DataFrame) -> int:
    return int(str(df._jdf.queryExecution().optimizedPlan().stats()
                   .sizeInBytes()))


def _task_budget() -> int:
    """Bytes one task is assumed able to hold for a WindowExec window
    partition (sort buffer + spill churn). Above this, the opt-in
    families route distributed regardless of local-scale measurement."""
    return int(
        os.environ.get("SPARK_GRAFT_TASK_BUDGET", 8 * 1024**3)
    )


# the NDV probe reads at most this many child rows — the gate needs one
# bit (NDV ≲ 4×parallelism), not a precise count, and a full-child scan
# per new query text would itself cost a 100 TB pass (round-12 verdict
# item 4). A limit-pushed prefix CAN under-count a clustered key (e.g.
# sorted input whose first rows share one value) — that errs toward
# routing DISTRIBUTED, whose per-task work is bounded either way; the
# reverse error (missing the wall) needs > _NDV_PROBE_ROWS rows to
# contain ≤ 4×parallelism distinct keys while the full data is high-NDV,
# which a 1M-row prefix makes implausible.
_NDV_PROBE_ROWS = 1_000_000


def _ndv_probe_df(df: DataFrame, cols: list[str]) -> DataFrame:
    """The bounded probe plan: key columns only, LIMIT-pushed, one
    approx-distinct — split out so tests can pin the plan shape."""
    return (
        df.select(*cols)
        .limit(_NDV_PROBE_ROWS)
        .agg(F.approx_count_distinct(F.xxhash64(*cols)).alias("__ndv"))
    )


def _measure_ndv(df: DataFrame, part_refs) -> int | None:
    """Approximate NDV of the window-partition key over a BOUNDED probe
    (``LIMIT _NDV_PROBE_ROWS`` — limit-pushed into the scan, so the job
    reads ~one task's worth of input, not the full child). None when the
    refs are not child columns (caller falls back to WindowExec)."""
    by_lower = {c.lower(): c for c in df.columns}
    cols = [by_lower.get(r) or by_lower.get(r.split(".")[-1]) for r in part_refs]
    if None in cols:
        return None
    if not cols:
        return 1  # empty PARTITION BY: one global partition
    return _ndv_probe_df(df, cols).first()[0]


def _maybe_warn_gated(
    spark, run_sql, from_text, where_text, stash, kw, mode, reason
) -> None:
    """Warn about the WindowExec wall only when the routing gate would
    actually have fired (forced mode, or a large child input) — small
    interactive inputs take the plain window plan by design."""
    if mode == "distributed":
        _warn_wall(reason)
        return
    try:
        child_sql = _child_sql(from_text, where_text, stash)
        size = _SIZE_CACHE.get(child_sql)
        if size is None:
            size = _plan_bytes(_run_child(spark, run_sql, child_sql, kw))
            if len(_SIZE_CACHE) < _CACHE_MAX:
                _SIZE_CACHE[child_sql] = size
        if size >= _size_gate():
            _warn_wall(reason)
    except Exception:
        pass

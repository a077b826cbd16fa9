"""DuckDB ``PIVOT`` shorthand executed on Spark.

DuckDB's dynamic pivot statement —

    PIVOT <dataset> ON <col> USING <agg> [GROUP BY <cols>]

(user SQL pass-through surface; reference runs any DuckDB statement the
query tab receives, src/worker.ts:516-541) — has no Spark SQL grammar.
Like DuckDB's own binder, the router first discovers the ON column's
distinct values with one small job, then lowers the statement to
``<agg> FILTER (WHERE <col> = <value>)`` output columns. The FILTER
lowering reproduces DuckDB's missing-combination semantics exactly:
``count`` → 0, ``sum``/``avg`` → NULL — no fill step, no special cases.

Scale shape: the distinct-value discovery is an aggregation on one
column (pushed-down scan, tiny shuffle) and is capped at
``MAX_PIVOT_VALUES`` — a dynamic pivot wider than that is a modeling
error at any scale. The lowered query itself is a single grouped
aggregation: one shuffle on the GROUP BY keys, conditional aggregation
map-side, identical to the hand-written FILTER form (q23).

Supported: a table name or parenthesized subquery dataset, one ON
column, one USING aggregate, optional GROUP BY list. DuckDB's further
forms (multiple ON columns, ``IN (...)`` value lists, multiple USING
aggregates) fall through with ``None`` — the caller surfaces Spark's
loud parse error rather than guessing semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

MAX_PIVOT_VALUES = 10_000

_PIVOT_HEAD = re.compile(r"^\s*PIVOT\s+", re.IGNORECASE)
_IDENT = re.compile(r"[A-Za-z_][\w.]*")
_ON_USING = re.compile(
    r"\s*ON\s+([A-Za-z_][\w]*)\s+USING\s+", re.IGNORECASE
)
_GROUP_BY = re.compile(r"\bGROUP\s+BY\b", re.IGNORECASE)


def _balanced_close(s: str, open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return -1


def _value_literal(v) -> str | None:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    return None


def try_rewrite_pivot(spark: SparkSession, sql: str) -> DataFrame | None:
    """If ``sql`` is a full-statement DuckDB PIVOT shorthand, run it and
    return the result DataFrame; otherwise return ``None``."""
    from vscode_parquet_visualizer_spark.plans import dialect

    lowered = lower_pivot_text(spark, sql)
    if lowered is None:
        return None
    return spark.sql(dialect.transpile(lowered))


def lower_pivot_text(spark: SparkSession, sql: str) -> str | None:
    """Lower a DuckDB PIVOT-shorthand statement to a plain grouped
    SELECT in DuckDB-dialect text (the FILTER lowering with exact
    absent-group fill), or ``None`` if ``sql`` isn't a supported
    shorthand. Text-level so the same lowering serves the
    full-statement route AND the subquery form
    ``SELECT … FROM (PIVOT t ON c USING agg)`` (r10 verdict item 4)."""
    s = sql.strip().rstrip(";").strip()
    m = _PIVOT_HEAD.match(s)
    if m is None:
        return None
    rest = s[m.end() :]
    if rest.startswith("("):
        close = _balanced_close(rest, 0)
        if close < 0:
            return None
        src, rest = rest[: close + 1], rest[close + 1 :]
        from_clause = f"{src} __pivot_src"
    else:
        mt = _IDENT.match(rest)
        if mt is None:
            return None
        src, rest = mt.group(0), rest[mt.end() :]
        from_clause = src
    mo = _ON_USING.match(rest)
    if mo is None:
        return None  # multi-ON / IN-list forms not lowered — fail loud upstream
    on_col = mo.group(1)
    tail = rest[mo.end() :]
    # split a TOP-LEVEL trailing ORDER BY / LIMIT off the tail (wave
    # 48: `… GROUP BY g ORDER BY g` leaked the ORDER BY into the
    # group-by text); depth-scan so in-call ORDER BY (string_agg(x
    # ORDER BY y)) is never touched
    suffix = ""
    depth = 0
    i = 0
    while i < len(tail):
        ch = tail[i]
        if ch == "'":
            # skip string literals ('' doubling) — a LIMIT/ORDER
            # spelling inside one must not split (ADVICE r10)
            j = i + 1
            while j < len(tail):
                if tail[j] == "'":
                    if j + 1 < len(tail) and tail[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            # left word boundary: `GROUP BY rate_limit` must not split
            # mid-identifier at its `limit` suffix (ADVICE r10)
            and (i == 0 or not (tail[i - 1].isalnum() or tail[i - 1] == "_"))
            and re.match(r"(?:ORDER\s+BY|LIMIT)\b", tail[i:], re.IGNORECASE)
        ):
            tail, suffix = tail[:i], " " + tail[i:]
            break
        i += 1
    mg = _GROUP_BY.search(tail)
    if mg is not None:
        agg, group_by = tail[: mg.start()].strip(), tail[mg.end() :].strip()
    else:
        agg, group_by = tail.strip(), None
    from vscode_parquet_visualizer_spark.plans import dialect

    # multiple USING aggregates (wave 48): one FILTER column per
    # (value, aggregate) pair, named {value}_{alias} — alias is the
    # AS name when given, else the aggregate's own text (DuckDB's
    # naming, probed: `0_s, 0_c` / `0_sum(v)`). The FILTER lowering
    # keeps DuckDB's absent-group fill exactly (count → 0, sum → NULL)
    # where a native pivot would NULL-fill count cells.
    aggs: list[tuple[str, str | None]] = []
    for item in dialect._split_top_level(agg):
        item = item.strip()
        am = re.match(r"(?s)(.*?)\s+AS\s+([A-Za-z_]\w*)\s*$", item, re.IGNORECASE)
        if am is not None:
            aggs.append((am.group(1).strip(), am.group(2)))
        else:
            aggs.append((item, None))
    if not aggs:
        return None

    vals_sql = dialect.transpile(
        f"SELECT DISTINCT {on_col} AS __v FROM {from_clause} "
        f"WHERE {on_col} IS NOT NULL LIMIT {MAX_PIVOT_VALUES + 1}"
    )
    values = sorted(r["__v"] for r in spark.sql(vals_sql).collect())
    if len(values) > MAX_PIVOT_VALUES:
        raise ValueError(
            f"PIVOT ON {on_col} exceeds {MAX_PIVOT_VALUES} distinct values"
        )
    cols = []
    for v in values:
        lit = _value_literal(v)
        if lit is None:
            return None
        for expr, alias in aggs:
            if len(aggs) == 1 and alias is None:
                name = str(v).replace("`", "``")
            else:
                name = f"{v}_{alias or expr}".replace("`", "``")
            cols.append(
                f"{expr} FILTER (WHERE {on_col} = {lit}) AS `{name}`"
            )
    if group_by:
        lowered = (
            f"SELECT {group_by}, {', '.join(cols)} FROM {from_clause} "
            f"GROUP BY {group_by}"
        )
    else:
        lowered = f"SELECT {', '.join(cols)} FROM {from_clause}"
    return lowered + suffix


_UNPIVOT_STMT = re.compile(
    r"^\s*UNPIVOT\s+([A-Za-z_][\w.]*)\s+ON\s+(.+?)\s+"
    r"INTO\s+NAME\s+([A-Za-z_]\w*)\s+VALUE\s+([A-Za-z_]\w*)\s*$",
    re.IGNORECASE | re.DOTALL,
)


def try_rewrite_unpivot(spark: SparkSession, sql: str) -> DataFrame | None:
    """DuckDB ``UNPIVOT <tbl> ON c1, c2, ... INTO NAME n VALUE v``
    shorthand → ``DataFrame.unpivot``. Every non-ON column becomes an id
    column; NULL values are dropped (DuckDB's unpivot excludes them —
    Spark's keeps them, so the filter restores parity). Stacked-column
    ``(a, b) AS x`` forms and ``COLUMNS(*)`` are not lowered — they fall
    through to a loud parse error rather than silent wrongness."""
    s = sql.strip().rstrip(";").strip()
    m = _UNPIVOT_STMT.match(s)
    if m is None:
        return None
    src, on_list, name_col, value_col = m.groups()
    cols = [c.strip() for c in on_list.split(",")]
    if not all(re.fullmatch(r"[A-Za-z_]\w*", c) for c in cols):
        return None  # expression/stacked/COLUMNS() forms not lowered
    df = spark.table(src)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"UNPIVOT ON columns not in {src}: {missing}")
    ids = [c for c in df.columns if c not in cols]
    out = df.unpivot(
        ids=ids,
        values=cols,
        variableColumnName=name_col,
        valueColumnName=value_col,
    )
    from pyspark.sql import functions as F

    return out.filter(F.col(value_col).isNotNull())



def route_embedded_pivots(spark: SparkSession, sql: str) -> str:
    """Lower DuckDB PIVOT-shorthand DERIVED TABLES —
    ``… FROM (PIVOT t ON c USING agg [GROUP BY …]) [alias] …`` — in
    place (r10 verdict item 4: the subquery form previously fell
    through to a Spark parse error; the full-statement route only
    matched a leading PIVOT). Each parenthesized shorthand is replaced
    by its FILTER lowering, which keeps DuckDB's absent-group fill
    (count → 0) exactly. Literal-protected scan so PIVOT-like text in
    string data is never touched."""
    if re.search(r"\(\s*PIVOT\b", sql, re.IGNORECASE) is None:
        return sql
    from vscode_parquet_visualizer_spark.plans.dialect import (
        _protect_literals,
        _restore_literals,
    )

    prot, stash = _protect_literals(sql)
    out, pos = [], 0
    for _ in range(1000):
        m = re.search(r"\(\s*PIVOT\b", prot[pos:], re.IGNORECASE)
        if m is None:
            break
        open_idx = pos + m.start()
        close_idx = _balanced_close(prot, open_idx)
        if close_idx < 0:
            break
        inner = _restore_literals(
            prot[open_idx + 1 : close_idx], stash, form="duck"
        )
        lowered = lower_pivot_text(spark, inner)
        if lowered is None:
            out.append(prot[pos : close_idx + 1])
            pos = close_idx + 1
            continue
        reprot, extra = _protect_literals(lowered)
        # re-stash the lowered text's literals into the shared stash
        for lit in extra:
            stash.append(lit)
        reprot = re.sub(
            r"\x00(LIT|IDQ|BTK)(\d+)\x00",
            lambda mm: f"\x00{mm.group(1)}{int(mm.group(2)) + len(stash) - len(extra)}\x00",
            reprot,
        )
        out.append(prot[pos:open_idx] + "(" + reprot + ")")
        pos = close_idx + 1
    out.append(prot[pos:])
    return _restore_literals("".join(out), stash, form="duck")


_STD_PIVOT = re.compile(
    r"\bFROM\s+(?P<rel>\((?:[^()]|\([^()]*\)|\((?:[^()]|\([^()]*\))*\))*\)"
    r"|[A-Za-z_][\w.]*)\s+"
    r"PIVOT\s*\(\s*(?P<aggs>(?:[^()]|\([^()]*\))*?)\s+"
    r"FOR\s+(?P<col>[A-Za-z_]\w*)\s+IN\s*\((?P<vals>[^()]*)\)\s*\)",
    re.IGNORECASE,
)

# one aggregate item inside the standard PIVOT clause: a simple call
# over * / a bare column / a protected literal, with optional alias
_STD_AGG = re.compile(
    r"^(?P<fn>[A-Za-z_]\w*)\s*\(\s*(?P<op>\*|[A-Za-z_]\w*|\x00LIT\d+\x00)"
    r"\s*\)(?:\s+AS\s+(?P<alias>[A-Za-z_]\w*))?$",
    re.IGNORECASE,
)


def rewrite_standard_count_pivot(
    spark: SparkSession, sql: str, run_sql, **kw
) -> str:
    """SQL-standard ``<rel> PIVOT (agg[, agg…] FOR col IN (…))`` → the
    FILTER lowering, using the relation's resolved schema for the
    implicit group-by columns. Spark's native pivot NULL-fills absent
    COUNT cells where DuckDB fills 0 (wave-48 record); the lowering
    fires when the aggregate list contains a count (sum/avg/min/max
    NULL-fill identically in both engines, so count-free pivots stay
    on Spark's native route). DuckDB semantics reproduced (probed
    r11): id columns = relation columns minus the FOR column minus
    every aggregate's operand column; output columns value-major; a
    single alias-less aggregate names columns by the IN value alone
    (``value AS alias`` wins), otherwise ``{value}_{alias}`` with
    alias-less aggregates rendered as their own text (``count_star()``
    for ``count(*)``)."""
    if re.search(r"\bPIVOT\s*\(", sql, re.IGNORECASE) is None:
        return sql
    from vscode_parquet_visualizer_spark.plans.dialect import (
        _protect_literals,
        _restore_literals,
        _split_top_level,
    )

    prot, stash = _protect_literals(sql)

    def one(m: re.Match) -> str:
        rel, col = m.group("rel"), m.group("col")
        # parse the aggregate list: all items must be simple calls, and
        # at least one a count (only count's fill diverges); otherwise
        # keep Spark's native pivot route
        aggs: list[tuple[str, str, str | None]] = []
        for item in _split_top_level(m.group("aggs")):
            item = item.strip()
            if not item:
                continue
            am = _STD_AGG.match(item)
            if am is None:
                return m.group(0)
            aggs.append(
                (am.group("fn").lower(), am.group("op"), am.group("alias"))
            )
        if not aggs or not any(fn == "count" for fn, _, _ in aggs):
            return m.group(0)
        rel_duck = _restore_literals(rel, stash, form="duck")
        try:
            rel_cols = run_sql(
                spark, f"SELECT * FROM {rel_duck} __std_pivot_src LIMIT 0"
                if rel_duck.startswith("(")
                else f"SELECT * FROM {rel_duck} LIMIT 0",
                **kw,
            ).columns
        except Exception:
            return m.group(0)  # unresolvable source: keep native route
        consumed = {
            op.lower() for _, op, _ in aggs if op != "*"
        } | {col.lower()}
        ids = [c for c in rel_cols if c.lower() not in consumed]
        cols = []
        for item in _split_top_level(m.group("vals")):
            item = item.strip()
            if not item:
                continue
            vm = re.match(
                r"(?s)(.+?)\s+AS\s+([A-Za-z_]\w*)\s*$", item, re.IGNORECASE
            )
            vexpr, vname = (
                (vm.group(1).strip(), vm.group(2)) if vm else (item, None)
            )
            if vname is None:
                raw = vexpr
                lm = re.fullmatch(r"\x00LIT(\d+)\x00", raw)
                if lm is not None:
                    raw = stash[int(lm.group(1))][1:-1].replace("''", "'")
                vname = raw
            # DuckDB naming (probed r11, value-major order): single
            # alias-less aggregate → the value alone; otherwise
            # {value}_{alias-or-rendered-aggregate}, count(*)
            # rendering as count_star()
            for fn, op, alias in aggs:
                if len(aggs) == 1 and alias is None:
                    name = vname
                else:
                    rendered = (
                        "count_star()"
                        if (fn, op) == ("count", "*")
                        else f"{fn}({op})"
                    )
                    name = f"{vname}_{alias or rendered}"
                name = name.replace("`", "``")
                cols.append(
                    f"{fn}({op}) FILTER (WHERE {col} = {vexpr}) "
                    f"AS `{name}`"
                )
        if not cols:
            return m.group(0)
        # id columns come from the resolved source schema and may need
        # quoting (reserved words, spaces, unicode) — backtick each,
        # doubling embedded backticks
        qids = ["`" + c.replace("`", "``") + "`" for c in ids]
        sel = (", ".join(qids) + ", ") if ids else ""
        grp = f" GROUP BY {', '.join(qids)}" if ids else ""
        return (
            f"FROM (SELECT {sel}{', '.join(cols)} FROM {rel} "
            f"__std_pivot_src{grp})"
        )

    out = _STD_PIVOT.sub(one, prot)
    return _restore_literals(out, stash, form="duck")

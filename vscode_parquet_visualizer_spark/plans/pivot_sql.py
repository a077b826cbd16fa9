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
    return spark.sql(dialect.transpile(lowered + suffix))


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



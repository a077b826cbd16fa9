"""DuckDB ``ASOF JOIN`` SQL surface → the operators/asof.py plan.

The reference hands ``FROM a ASOF JOIN b ON a.k = b.k AND a.t >= b.t``
straight to DuckDB (src/duckdb-backend.ts:142-146). Spark has no ASOF
JOIN grammar, and there is no clean pure-SQL lowering (the first-match
semantics need either a unique left row id or a non-equality correlated
subquery Spark rejects), so the engine routes the join itself: parse the
top-level ASOF JOIN clause, execute it with ``asof.asof_join`` (the
union+window single-shuffle plan), register the result as a temp view,
and splice the rest of the query onto that view with the alias
qualifiers rewritten.

Supported shape — the one DuckDB's docs teach: top-level two-relation
``FROM l [la] ASOF [LEFT] JOIN r [ra] ON <eq-conds AND one inequality>``
with catalog/temp-view relation names. Strict ``>``/``<`` inequalities
raise (the operator is ties-inclusive); anything else unparseable —
including an ASOF JOIN inside a subquery — returns None and falls
through to Spark's parser to fail loudly. Clause matching runs on
literal-protected text (dialect._protect_literals), so join-like text
inside a string literal is never spliced.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from vscode_parquet_visualizer_spark.operators.asof import asof_join
from vscode_parquet_visualizer_spark.plans.dialect import (
    _protect_literals,
    _restore_literals,
)


def _at_top_level(sql: str, idx: int) -> bool:
    """True when ``sql[idx]`` sits at paren depth 0 (not in a subquery).
    Assumes literals are already placeholder-protected."""
    depth = 0
    for ch in sql[:idx]:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
    return depth == 0

_KW_STOP = r"(?=\bWHERE\b|\bGROUP\s+BY\b|\bORDER\s+BY\b|\bLIMIT\b|\bQUALIFY\b|\bWINDOW\b|$)"
_REL = (
    r"([A-Za-z_][\w.]*)"
    r"(?:\s+(?:AS\s+)?(?!ASOF\b|LEFT\b|JOIN\b|ON\b)([A-Za-z_]\w*))?"
)
_ASOF = re.compile(
    r"\bFROM\s+" + _REL + r"\s+ASOF\s+(LEFT\s+)?JOIN\s+" + _REL
    + r"\s+ON\s+(.+?)\s*" + _KW_STOP,
    re.IGNORECASE | re.DOTALL,
)
_COND = re.compile(
    r"\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*(>=|<=|>|<|=)\s*"
    r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*$"
)

_POSITIONAL = re.compile(
    r"\bFROM\s+" + _REL + r"\s+POSITIONAL\s+JOIN\s+" + _REL + r"\s*" + _KW_STOP,
    re.IGNORECASE | re.DOTALL,
)

_counter = 0


def try_rewrite_positional(spark: SparkSession, sql: str) -> str | None:
    """``FROM a [x] POSITIONAL JOIN b [y]`` → execute with
    operators/positional.py and splice onto the result view (same
    engine-routing pattern as ASOF JOIN; Spark has no positional
    grammar). Alias-qualified references map to the joined columns."""
    from vscode_parquet_visualizer_spark.operators.positional import (
        positional_join,
    )

    sql, stash = _protect_literals(sql)  # clause regexes can't match
    # POSITIONAL-JOIN-like text inside string literals
    m = _POSITIONAL.search(sql)
    if not m or not _at_top_level(sql, m.start()):
        return None  # absent, or inside a subquery — fail loudly upstream
    lrel, lali, rrel, rali = m.groups()
    lali, rali = lali or lrel, rali or rrel
    left, right = spark.table(lrel), spark.table(rrel)
    joined = positional_join(left, right)
    global _counter
    _counter += 1
    view = f"__pj_{_counter}"
    joined.createOrReplaceTempView(view)
    out = sql[: m.start()] + f"FROM {view} " + sql[m.end():]
    left_cols = set(left.columns)
    for c in right.columns:
        tgt = c + "_right" if c in left_cols else c
        out = re.sub(rf"\b{re.escape(rali)}\.{re.escape(c)}\b", tgt, out)
    out = re.sub(rf"\b{re.escape(lali)}\.([A-Za-z_]\w*)\b", r"\1", out)
    return _restore_literals(out, stash, form="duck")


def try_rewrite_asof(spark: SparkSession, sql: str) -> str | None:
    """If ``sql`` contains a supported top-level ASOF JOIN, execute the
    join and return the query rewritten over the result view; else None."""
    sql, stash = _protect_literals(sql)  # clause regexes can't match
    # ASOF-JOIN-like text inside string literals
    m = _ASOF.search(sql)
    if not m or not _at_top_level(sql, m.start()):
        return None  # absent, or inside a subquery — fail loudly upstream
    lrel, lali, left_kw, rrel, rali, cond = m.groups()
    lali, rali = lali or lrel, rali or rrel

    eq: list[tuple[str, str]] = []
    ineq: tuple[str, str, str] | None = None
    for c in re.split(r"\bAND\b", cond, flags=re.IGNORECASE):
        cm = _COND.match(c)
        if not cm:
            return None  # unsupported condition — let the parser reject
        a, acol, op, b, bcol = cm.groups()
        if a == b or {a, b} != {lali, rali}:
            return None
        left_first = a == lali
        if op == "=":
            eq.append((acol, bcol) if left_first else (bcol, acol))
            continue
        strict = op in (">", "<")
        if left_first:
            ineq = (acol, bcol, "backward" if op in (">=", ">") else "forward", strict)
        else:
            ineq = (bcol, acol, "backward" if op in ("<=", "<") else "forward", strict)
    if ineq is None:
        return None
    lon, ron, direction, strict = ineq

    left, right = spark.table(lrel), spark.table(rrel)
    r = right
    if ron != lon:
        r = r.withColumnRenamed(ron, lon)
    by = []
    for lc, rc in eq:
        if rc != lc:
            r = r.withColumnRenamed(rc, lc)
        by.append(lc)

    matched_on = f"__{lon}_matched"
    joined: DataFrame = asof_join(
        left,
        r,
        on=lon,
        by=by,
        direction=direction,
        how="left" if left_kw else "inner",
        right_on_as=matched_on,
        strict=strict,
    )
    global _counter
    _counter += 1
    view = f"__aj_{_counter}"
    joined.createOrReplaceTempView(view)

    out = sql[: m.start()] + f"FROM {view} " + sql[m.end():]
    # alias-qualified references: left alias strips to bare names; right
    # value columns map through the operator's collision suffix; the
    # right on/by columns map to the left-side names (or the matched-on
    # column for the timestamp).
    left_cols = set(left.columns)
    right_by = {rc for _, rc in eq}
    for c in right.columns:
        if c == ron:
            tgt = matched_on
        elif c in right_by:
            tgt = next(lc for lc, rc in eq if rc == c)
        elif c in left_cols:
            tgt = c + "_right"
        else:
            tgt = c
        out = re.sub(rf"\b{re.escape(rali)}\.{re.escape(c)}\b", tgt, out)
    out = re.sub(rf"\b{re.escape(lali)}\.([A-Za-z_]\w*)\b", r"\1", out)
    return _restore_literals(out, stash, form="duck")

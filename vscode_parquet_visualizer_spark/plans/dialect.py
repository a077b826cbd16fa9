"""DuckDB→Spark SQL dialect rewriting (SURVEY.md §2B gaps, §4 tail).

The reference passes user SQL verbatim to DuckDB, so its users write
DuckDB-isms. Spark SQL covers the semantics; a handful of constructs need a
*syntactic* pre-rewrite before ``spark.sql``:

- ``FROM data`` placeholder and ``read_parquet('path')`` / ``read_csv`` /
  ``read_avro`` table functions → temp view names (the reference's regex
  substitution, src/worker.ts:247-266, run in reverse: we already register
  the file as view ``data``).
- ``expr::TYPE`` → ``CAST(expr AS TYPE)``.
- ``json -> 'k'`` / ``json ->> 'k'`` → ``get_json_object(json, '$.k')``.
- ``QUALIFY pred`` → wrap in a subquery and filter (Spark lacks QUALIFY).
- ``SELECT * EXCLUDE (a, b)`` → ``SELECT * EXCEPT (a, b)`` (Spark 3.4+).
- a small function-name map (``strftime``→``date_format`` with pattern
  translation, ``list_*``→array functions, etc.).

These are string/regex rewrites, not a SQL parser: they cover the
reference-reachable surface (its own constructed SQL plus common user
idioms) and leave everything else untouched for Catalyst to parse. True
dialect completeness would use sqlglot (not available in this container).
"""

from __future__ import annotations

import re

_TYPE = r"[A-Za-z_][A-Za-z0-9_]*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?"

# DuckDB function name → Spark function name (same arg shape)
FUNCTION_RENAMES = {
    "list_contains": "array_contains",
    "list_sort": "sort_array",
    "list_transform": "transform",
    "list_filter": "filter",
    "list_aggregate": "aggregate",
    "len": "length",
    "string_agg": "string_agg",  # supported in Spark 4 (listagg alias)
    "array_length": "size",
    "regexp_matches": "rlike",
    "strip_accents": "translate",  # approximation; documented gap
    "epoch_ms": "unix_millis",
}

_STRFTIME_MAP = [
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%I", "hh"), ("%M", "mm"), ("%S", "ss"),
    ("%f", "SSSSSS"), ("%g", "SSS"), ("%p", "a"), ("%j", "DDD"),
    ("%a", "EEE"), ("%A", "EEEE"), ("%b", "MMM"), ("%B", "MMMM"),
    ("%%", "%"),
]


def translate_strftime_pattern(pattern: str) -> str:
    """DuckDB strftime % patterns → JVM SimpleDateFormat patterns."""
    out = pattern
    for duck, jvm in _STRFTIME_MAP:
        out = out.replace(duck, jvm)
    return out


def rewrite_from_data(sql: str, view: str = "data") -> str:
    """Bind the ``data`` placeholder relation to this dataset's unique view
    (the reference's regex substitution, src/worker.ts:247-266: each
    document worker rewrites ``FROM data`` to its own file read — here each
    Dataset rewrites to its own temp view so two open files can't cross).
    Also rewrites explicit ``read_parquet('p')``-style table functions."""
    sql = re.sub(
        r"read_(?:parquet|csv|csv_auto|avro|json|json_auto)\s*\(\s*'[^']*'\s*\)",
        view,
        sql,
        flags=re.IGNORECASE,
    )
    if view != "data":
        # FROM/JOIN data (optionally followed by alias/clause) — same
        # word-boundary regex idea as the reference's formatQueryString
        sql = re.sub(
            r"\b(FROM|JOIN)\s+data\b", rf"\1 {view}", sql, flags=re.IGNORECASE
        )
    return sql


def rewrite_pg_cast(sql: str) -> str:
    """``expr::TYPE`` → ``CAST(expr AS TYPE)`` for simple operands
    (identifier, quoted identifier, literal, or parenthesized expr)."""
    operand = r"""(
        '(?:[^']|'')*'              # string literal
      | "[^"]+"                     # quoted identifier
      | \([^()]*\)                  # parenthesized (non-nested)
      | [A-Za-z_][A-Za-z0-9_.]*\([^()]*\)   # simple call
      | [A-Za-z_][A-Za-z0-9_.]*     # identifier / dotted path
      | \d+(?:\.\d+)?               # number
    )"""
    pattern = re.compile(operand + r"\s*::\s*(" + _TYPE + ")", re.VERBOSE)
    prev = None
    while prev != sql:  # handle chains / multiple occurrences
        prev = sql
        sql = pattern.sub(lambda m: f"CAST({m.group(1)} AS {m.group(2)})", sql)
    return sql


def rewrite_json_arrows(sql: str) -> str:
    """``col -> 'k'`` / ``col ->> 'k'`` → ``get_json_object(col, '$.k')``.

    DuckDB's ``->`` returns JSON, ``->>`` returns text; Spark's
    get_json_object returns text in both cases — fine for the common
    extract-then-compare usage; chained ``->`` should use a JSON path.
    """
    ident = r"([A-Za-z_][A-Za-z0-9_.]*|\"[^\"]+\")"
    sql = re.sub(
        ident + r"\s*->>\s*'([^']*)'",
        lambda m: f"get_json_object({m.group(1)}, '$.{m.group(2)}')",
        sql,
    )
    sql = re.sub(
        ident + r"\s*->\s*'([^']*)'",
        lambda m: f"get_json_object({m.group(1)}, '$.{m.group(2)}')",
        sql,
    )
    return sql


def rewrite_exclude(sql: str) -> str:
    """``* EXCLUDE (a, b)`` / ``* EXCLUDE a`` → ``* EXCEPT (a, b)``."""
    sql = re.sub(
        r"\*\s+EXCLUDE\s*\(([^)]*)\)", r"* EXCEPT (\1)", sql, flags=re.IGNORECASE
    )
    sql = re.sub(
        r"\*\s+EXCLUDE\s+([A-Za-z_][A-Za-z0-9_]*)",
        r"* EXCEPT (\1)",
        sql,
        flags=re.IGNORECASE,
    )
    return sql


def rewrite_qualify(sql: str) -> str:
    """``SELECT ... QUALIFY pred [ORDER BY ...] [LIMIT n]`` →
    subquery + WHERE. Only handles a top-level QUALIFY (the
    reference-reachable case); window aliases referenced in pred must be
    projected, which QUALIFY queries do by construction."""
    m = re.search(r"\bQUALIFY\b", sql, flags=re.IGNORECASE)
    if not m:
        return sql
    head = sql[: m.start()].rstrip()
    tail = sql[m.end():].strip().rstrip(";")
    # split trailing ORDER BY / LIMIT off the qualify predicate
    trail = ""
    tm = re.search(r"\b(ORDER\s+BY|LIMIT)\b", tail, flags=re.IGNORECASE)
    if tm:
        trail = " " + tail[tm.start():]
        tail = tail[: tm.start()].strip()
    return f"SELECT * FROM ({head}) __q WHERE {tail}{trail}"


def rewrite_regex_operators(sql: str) -> str:
    """DuckDB's ``expr ~ 'pattern'`` / ``!~`` → RLIKE / NOT RLIKE, and
    ``SIMILAR TO`` → RLIKE (note: SIMILAR TO is anchored in DuckDB; the
    rewrite preserves the pattern verbatim — anchor explicitly if needed)."""
    ident = r"([A-Za-z_][A-Za-z0-9_.]*|\"[^\"]+\"|\))"
    sql = re.sub(ident + r"\s*!~\s*", r"\1 NOT RLIKE ", sql)
    sql = re.sub(ident + r"\s*~\s*(?=')", r"\1 RLIKE ", sql)
    sql = re.sub(r"\bNOT\s+SIMILAR\s+TO\b", "NOT RLIKE", sql, flags=re.IGNORECASE)
    sql = re.sub(r"\bSIMILAR\s+TO\b", "RLIKE", sql, flags=re.IGNORECASE)
    return sql


def rewrite_columns_regex(sql: str, columns: list[str] | None) -> str:
    """DuckDB's ``COLUMNS('regex')`` star-expansion → explicit column list.
    Schema-aware: only possible when the caller supplies the relation's
    columns (Dataset.query does); left untouched otherwise."""
    if columns is None:
        return sql

    def expand(m: re.Match) -> str:
        pat = re.compile(m.group(1))
        hits = [f"`{c}`" for c in columns if pat.search(c)]
        return ", ".join(hits) if hits else m.group(0)

    return re.sub(r"COLUMNS\s*\(\s*'([^']*)'\s*\)", expand, sql, flags=re.IGNORECASE)


def rewrite_sample(sql: str) -> str:
    """``USING SAMPLE 10%`` / ``USING SAMPLE 100 ROWS`` →
    ``TABLESAMPLE (10 PERCENT)`` / ``TABLESAMPLE (100 ROWS)``."""
    sql = re.sub(
        r"USING\s+SAMPLE\s+(\d+(?:\.\d+)?)\s*%",
        r"TABLESAMPLE (\1 PERCENT)",
        sql,
        flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"USING\s+SAMPLE\s+(\d+)(\s+ROWS)?\b",
        r"TABLESAMPLE (\1 ROWS)",
        sql,
        flags=re.IGNORECASE,
    )
    return sql


def transpile(sql: str, view: str = "data", columns: list[str] | None = None) -> str:
    """Full DuckDB-dialect → Spark SQL rewrite chain. ``columns`` enables
    the schema-aware rewrites (COLUMNS('regex'))."""
    sql = rewrite_from_data(sql, view=view)
    sql = rewrite_columns_regex(sql, columns)
    sql = rewrite_pg_cast(sql)
    sql = rewrite_json_arrows(sql)
    sql = rewrite_exclude(sql)
    sql = rewrite_regex_operators(sql)
    sql = rewrite_sample(sql)
    sql = rewrite_qualify(sql)
    return sql

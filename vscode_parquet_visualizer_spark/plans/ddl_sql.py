"""User-typed session DDL and COPY statements (DuckDB shapes).

The reference's query tab passes statements to DuckDB verbatim
(src/duckdb-backend.ts:142-146), and the reference itself constructs
``CREATE OR REPLACE TABLE … AS`` (src/worker.ts:83-90) and ``COPY (…) TO
'…' (FORMAT …)`` (src/worker.ts:319-326) — so a user can type the same
forms. Spark-side:

- ``CREATE [OR REPLACE] [TEMP] TABLE name AS <query>`` → materialized
  session table: run the query through the gateway, persist, eager
  count (the same run-once-page-many contract as A5), bind a temp view.
  Returns DuckDB's one-row ``Count`` shape.
- ``CREATE [OR REPLACE] [TEMP] VIEW name AS <query>`` → lazy temp view
  (no materialization). Returns the empty ``Count`` shape.
- ``DROP TABLE|VIEW [IF EXISTS] name`` → unpersist + drop the view.
  Returns the empty ``Success`` shape.
- ``SHOW TABLES`` → one ``name`` column, sorted.
- ``COPY <table|(query)> TO 'path' [(options)]`` → the A13-A17 export
  operators (CSV/ndJSON/JSON-array/Parquet/Excel). Distributed-write
  semantics live in operators/export.py; this layer only parses the
  DuckDB option surface. Returns the one-row ``Count`` shape.

Everything is session-scope (temp views + cached DataFrames) — no
warehouse, mirroring the reference's in-memory DuckDB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from vscode_parquet_visualizer_spark.session import local_df
from pyspark.sql import types as T

_CTAS = re.compile(
    r"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?(?:TEMP\s+|TEMPORARY\s+)?"
    r"(?P<kind>TABLE|VIEW)\s+(?P<name>[A-Za-z_]\w*)\s*"
    r"(?:\((?P<cols>[A-Za-z_][\w\s,\"]*)\)\s*)?"
    r"\s+AS\s+(?P<body>.+)$",
    re.IGNORECASE | re.DOTALL,
)

# typed empty table: CREATE TABLE t (a INTEGER, b VARCHAR NOT NULL, …)
# — no AS body. Constraint entries (PRIMARY KEY(…), UNIQUE…, CHECK…)
# are skipped; per-column constraint suffixes are stripped (the engine's
# INSERT is positional full-arity, so DEFAULT never participates).
_CREATE_TYPED = re.compile(
    r"^\s*CREATE\s+(?P<replace>OR\s+REPLACE\s+)?(?:TEMP\s+|TEMPORARY\s+)?"
    r"TABLE\s+(?P<name>[A-Za-z_]\w*)\s*\((?P<cols>.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)

_ALTER = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<name>[A-Za-z_]\w*)\s+(?P<action>.+)$",
    re.IGNORECASE | re.DOTALL,
)

_UPDATE = re.compile(
    r"^\s*UPDATE\s+(?P<name>[A-Za-z_]\w*)\s+SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<pred>.+?))?"
    r"(?:\s+RETURNING\s+(?P<ret>.+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<name>[A-Za-z_]\w*)"
    r"(?:\s+WHERE\s+(?P<pred>.+?))?"
    r"(?:\s+RETURNING\s+(?P<ret>.+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_TRUNCATE = re.compile(
    r"^\s*TRUNCATE\s+(?:TABLE\s+)?(?P<name>[A-Za-z_]\w*)\s*$",
    re.IGNORECASE,
)

_DROP = re.compile(
    r"^\s*DROP\s+(?P<kind>TABLE|VIEW)\s+(?P<ifex>IF\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_]\w*)\s*$",
    re.IGNORECASE,
)

_SHOW_TABLES = re.compile(r"^\s*SHOW\s+TABLES\s*$", re.IGNORECASE)

_SESSION_NOOP = re.compile(
    r"^\s*(BEGIN(\s+TRANSACTION)?|COMMIT|ROLLBACK|ABORT|CHECKPOINT"
    r"|FORCE\s+CHECKPOINT|VACUUM(\s+ANALYZE)?|ANALYZE"
    # DuckDB ART indexes are a perf structure with no result-visible
    # effect; Spark has no index objects, so accept-and-ignore (wave
    # 45). The UNIQUE variant's constraint enforcement is NOT emulated
    # — documented in COVERAGE.md.
    r"|CREATE\s+(UNIQUE\s+)?INDEX\s+(IF\s+NOT\s+EXISTS\s+)?[A-Za-z_]\w*"
    r"\s+ON\s+[^;]+"
    r"|DROP\s+INDEX\s+(IF\s+EXISTS\s+)?[A-Za-z_]\w*"
    # COMMENT ON (wave 48): DuckDB stores object comments in catalog
    # metadata (observable only via duckdb_* introspection functions);
    # the engine's temp views carry none — accept-and-ignore
    r"|COMMENT\s+ON\s+(TABLE|VIEW|COLUMN|INDEX|SEQUENCE|TYPE|MACRO"
    r"|MACRO\s+TABLE|DATABASE|SCHEMA)\s+[^;]+IS\s+[^;]+)\s*$",
    re.IGNORECASE,
)

_INSERT = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<name>[A-Za-z_]\w*)\s*"
    r"(?P<cols>\((?:[^()]|\([^()]*\))*\))?\s*(?P<body>.+?)"
    r"(?:\s+RETURNING\s+(?P<ret>.+))?$",
    re.IGNORECASE | re.DOTALL,
)

_EXPLAIN = re.compile(
    r"^\s*EXPLAIN\s+(?:ANALYZE\s+)?(?P<body>.+)$", re.IGNORECASE | re.DOTALL
)

_PRAGMA_TABLE_INFO = re.compile(
    r"^\s*PRAGMA\s+table_info\s*\(\s*'?(?P<name>[A-Za-z_]\w*)'?\s*\)\s*$",
    re.IGNORECASE,
)

# statement-level pragmas DuckDB exposes as introspection shortcuts
# (PRAGMA database_size is storage-engine-specific and stays unrouted —
# loud, like other unsupported statements)
_PRAGMA_SHOW_TABLES = re.compile(
    r"^\s*PRAGMA\s+show_tables\s*(;)?\s*$", re.IGNORECASE
)
_PRAGMA_SHOW_TABLES_EXPANDED = re.compile(
    r"^\s*PRAGMA\s+show_tables_expanded\s*(;)?\s*$", re.IGNORECASE
)
_PRAGMA_VERSION = re.compile(r"^\s*PRAGMA\s+version\s*(;)?\s*$", re.IGNORECASE)

# DuckDB session-configuration statements. SET records the value (and
# maps TimeZone onto the live session conf); RESET restores the default;
# CHECKPOINT is a WAL flush with no Spark analogue — success no-op.
_SET_STMT = re.compile(
    r"^\s*SET\s+(?:SESSION\s+|GLOBAL\s+)?(?!VARIABLE\b)(?P<name>[A-Za-z_]\w*)\s*"
    r"(?:=|\bTO\b)\s*(?P<value>.+?)\s*$",
    re.IGNORECASE,
)
_RESET_STMT = re.compile(
    r"^\s*RESET\s+(?:SESSION\s+|GLOBAL\s+)?(?P<name>[A-Za-z_]\w*)\s*$",
    re.IGNORECASE,
)
_CHECKPOINT_STMT = re.compile(
    r"^\s*(?:FORCE\s+)?CHECKPOINT\s*(;)?\s*$", re.IGNORECASE
)

# per-session recorded settings: (sparkId) → {lowercase name: value}
_session_settings: dict[int, dict[str, str]] = {}


def current_setting(spark: SparkSession, name: str) -> str:
    """Resolve ``current_setting('name')``: recorded SET values first,
    then the live session mappings DuckDB users actually read."""
    key = name.lower()
    rec = _session_settings.get(id(spark), {})
    if key in rec:
        return rec[key]
    if key == "timezone":
        return spark.conf.get("spark.sql.session.timeZone")
    if key == "threads":
        return str(spark.sparkContext.defaultParallelism)
    raise ValueError(f'unrecognized configuration parameter "{name}"')

_COPY = re.compile(r"^\s*COPY\s+", re.IGNORECASE)

_COUNT_SCHEMA = T.StructType([T.StructField("Count", T.LongType())])
_SUCCESS_SCHEMA = T.StructType([T.StructField("Success", T.BooleanType())])

# PREPARE name AS <stmt> / EXECUTE name(args) / DEALLOCATE [PREPARE] name
# (batch 41). The prepared BODY is stored as raw dialect text and bound
# + re-routed through the gateway at EXECUTE time, so every statement
# kind a user can prepare keeps its normal routing. Parameter styles:
# positional ``?`` / ``$1`` and named ``$key`` with ``key := value``
# EXECUTE args — matching DuckDB's surface.
_PREPARE = re.compile(
    r"^\s*PREPARE\s+(?P<name>\w+)\s+AS\s+(?P<body>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_EXECUTE = re.compile(
    r"^\s*EXECUTE\s+(?P<name>\w+)\s*(?:\(\s*(?P<args>.*?)\s*\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DEALLOCATE = re.compile(
    r"^\s*DEALLOCATE\s+(?:PREPARE\s+)?(?P<name>\w+)\s*$", re.IGNORECASE
)
_session_prepared: dict[tuple[int, str], str] = {}


def _bind_prepared(body: str, args_text: str) -> str:
    """Substitute EXECUTE arguments into a prepared body.

    Body AND argument text are literal-protected together (one stash)
    before any splitting or substitution, so (a) commas inside string
    arguments — ``EXECUTE q('a,b', 2)`` — can't mis-split the argument
    list, and (b) ``?`` / ``$n`` inside string arguments —
    ``EXECUTE q('what?')`` — can't be re-consumed by the parameter
    passes. Substitution goes through opaque ``\\x00ARGn\\x00``
    placeholders so spliced values are never re-scanned; literals are
    restored once at the very end."""
    from vscode_parquet_visualizer_spark.plans.dialect import (
        _protect_literals,
        _restore_literals,
        _split_top_level,
    )

    # \x01 can't occur in SQL text; literals never span the boundary
    # because body and args come from disjoint regex groups.
    protected_all, stash = _protect_literals(body + "\x01" + args_text)
    protected, p_args = protected_all.split("\x01", 1)
    named: dict[str, str] = {}
    positional: list[str] = []
    for item in _split_top_level(p_args):
        item = item.strip()
        if not item:
            continue
        nm = re.match(r"(\w+)\s*:=\s*(.+)$", item, re.DOTALL)
        if nm:
            named[nm.group(1).lower()] = nm.group(2).strip()
        else:
            positional.append(item)

    values: list[str] = []

    def _placeholder(v: str) -> str:
        values.append(v)
        return f"\x00ARG{len(values) - 1}\x00"

    def dollar(m: re.Match) -> str:
        tok = m.group(1)
        if tok.isdigit():
            i = int(tok) - 1
            if 0 <= i < len(positional):
                return _placeholder(positional[i])
            raise ValueError(f"EXECUTE: missing parameter ${tok}")
        v = named.get(tok.lower())
        if v is None:
            raise ValueError(f"EXECUTE: missing parameter ${tok}")
        return _placeholder(v)

    protected = re.sub(r"\$(\w+)", dollar, protected)
    qpos = 0

    def qmark(m: re.Match) -> str:
        nonlocal qpos
        if qpos >= len(positional):
            raise ValueError("EXECUTE: not enough positional parameters")
        v = positional[qpos]
        qpos += 1
        return _placeholder(v)

    protected = re.sub(r"\?", qmark, protected)
    protected = re.sub(
        r"\x00ARG(\d+)\x00", lambda m: values[int(m.group(1))], protected
    )
    return _restore_literals(protected, stash, form="duck")

# session tables created here, for unpersist-on-replace: (sparkId, name) → df
_session_tables: dict[tuple[int, str], DataFrame] = {}


def table_info_df(spark: SparkSession, name: str) -> DataFrame:
    """DuckDB ``PRAGMA table_info`` row shape (cid, name, type, notnull,
    dflt_value, pk) for a registered table/view — shared by the PRAGMA
    statement route and the ``pragma_table_info()`` table function."""
    from vscode_parquet_visualizer_spark.functions.schema_format import (
        duckdb_type_string,
    )

    df = spark.table(name)
    rows = [
        (i, f.name, duckdb_type_string(f.dataType), not f.nullable, None, False)
        for i, f in enumerate(df.schema.fields)
    ]
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("cid", T.IntegerType()),
                T.StructField("name", T.StringType()),
                T.StructField("type", T.StringType()),
                T.StructField("notnull", T.BooleanType()),
                T.StructField("dflt_value", T.StringType()),
                T.StructField("pk", T.BooleanType()),
            ]
        ),
    ).coalesce(1)


def _count_df(spark: SparkSession, n: int | None) -> DataFrame:
    rows = [] if n is None else [(n,)]
    return local_df(spark, rows, _COUNT_SCHEMA)


# --- sequences and ENUM types (wave 48) --------------------------------
# DuckDB CREATE SEQUENCE / nextval / currval (src: the reference app's
# DuckDB backend supports arbitrary session DDL). Session-scoped
# counters; nextval advances per CALL in driver-evaluated statements.
_CREATE_SEQ = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?SEQUENCE\s+"
    r"(?P<ifnex>IF\s+NOT\s+EXISTS\s+)?(?P<name>[A-Za-z_]\w*)"
    r"(?P<opts>[^;]*?)\s*$",
    re.IGNORECASE,
)
_DROP_SEQ = re.compile(
    r"^\s*DROP\s+SEQUENCE\s+(?P<ifex>IF\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_]\w*)\s*$",
    re.IGNORECASE,
)
# id(spark), lower_name → {"next": int, "inc": int, "max": int|None,
# "min": int|None, "curr": int|None}
_session_sequences: dict[tuple[int, str], dict] = {}

_CREATE_ENUM = re.compile(
    r"^\s*CREATE\s+TYPE\s+(?P<name>[A-Za-z_]\w*)\s+AS\s+ENUM\s*"
    r"\((?P<vals>[^)]*)\)\s*$",
    re.IGNORECASE,
)
_DROP_TYPE = re.compile(
    r"^\s*DROP\s+TYPE\s+(?P<ifex>IF\s+EXISTS\s+)?(?P<name>[A-Za-z_]\w*)\s*$",
    re.IGNORECASE,
)
# id(spark), lower_name → list of member strings (definition order)
_session_enums: dict[tuple[int, str], list[str]] = {}

_SEQ_CALL = re.compile(
    r"\b(nextval|currval)\s*\(\s*'([^']*)'\s*\)", re.IGNORECASE
)
# after _protect_literals the sequence-name argument is a stash
# placeholder, so the protected-text matcher resolves it by index
_SEQ_CALL_PROT = re.compile(
    r"\b(nextval|currval)\s*\(\s*\x00LIT(\d+)\x00\s*\)", re.IGNORECASE
)


def _has_top_level_from(protected: str) -> bool:
    """True only for a real depth-0 ``FROM`` clause — ``extract(year
    FROM …)`` / subquery FROMs sit inside parentheses and don't make
    the statement per-row (ADVICE r10)."""
    depth = 0
    for m in re.finditer(r"[()]|\bFROM\b", protected, re.IGNORECASE):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            return True
    return False


def substitute_sequences(spark: SparkSession, sql: str) -> str:
    """Replace ``nextval('s')`` / ``currval('s')`` with literal values,
    advancing the session counter per occurrence — exact for statements
    the driver evaluates once (SELECT without FROM, VALUES inserts: the
    dominant sequence usage in an engine with no column DEFAULTs).
    Per-ROW nextval over a relation would need the row count to advance
    the counter; that shape raises loudly rather than silently
    under-advancing.

    Runs over literal-PROTECTED text (ADVICE r10: ``$$… nextval('s')
    …$$`` inside a string was being rewritten, corrupting the data AND
    advancing the counter), and the per-row guard looks for a real
    depth-0 FROM clause, not any ``FROM`` token."""
    if not _SEQ_CALL.search(sql):
        return sql
    from vscode_parquet_visualizer_spark.plans.dialect import (
        _protect_literals,
        _restore_literals,
    )

    prot, stash = _protect_literals(sql)
    if not _SEQ_CALL_PROT.search(prot):
        return sql  # every call sits inside a string literal — data
    if _has_top_level_from(prot) and re.search(
        r"\bnextval\b", prot, re.IGNORECASE
    ):
        raise NotImplementedError(
            "nextval() per input row is not supported — sequences advance "
            "per statement here; use row_number() for row ids"
        )

    def sub(m: re.Match) -> str:
        fn = m.group(1).lower()
        arg = stash[int(m.group(2))]
        name = arg[1:-1].replace("''", "'").lower()
        seq = _session_sequences.get((id(spark), name))
        if seq is None:
            raise ValueError(
                f"Sequence with name {arg[1:-1]} does not exist!"
            )
        if fn == "currval":
            if seq["curr"] is None:
                raise ValueError(
                    "currval: sequence is not yet defined in this session"
                )
            return str(seq["curr"])
        val = seq["next"]
        if seq["max"] is not None and val > seq["max"]:
            raise ValueError(
                f'nextval: reached maximum value of sequence "{name}" '
                f"({seq['max']})"
            )
        if seq["min"] is not None and val < seq["min"]:
            raise ValueError(
                f'nextval: reached minimum value of sequence "{name}" '
                f"({seq['min']})"
            )
        seq["curr"] = val
        seq["next"] = val + seq["inc"]
        return str(val)

    return _restore_literals(_SEQ_CALL_PROT.sub(sub, prot), stash, form="duck")


# enum-cast operand forms: stash placeholder, a CALL with balanced
# parens (≤3 nesting levels), or a dotted identifier — longest first
_ENUM_OPND = (
    r"(?:\x00LIT\d+\x00"
    r"|[A-Za-z_][\w.]*\s*\((?:[^()]|\([^()]*\)"
    r"|\((?:[^()]|\([^()]*\))*\))*\)"
    r"|[A-Za-z_][\w.]*)"
)


def _enum_index_expr(
    operand: str, stash: list[str], name: str, vals: list[str]
) -> str:
    """Member-index expression for an enum-cast operand: a stash
    placeholder folds to its index (loud on a non-member, DuckDB's
    bind-time ConversionError); an identifier/expression gets a runtime
    CASE — NULL stays NULL, a non-member raises."""
    pm = re.fullmatch(r"\x00LIT(\d+)\x00", operand.strip())
    if pm is not None:
        raw = stash[int(pm.group(1))][1:-1].replace("''", "'")
        if raw not in vals:
            raise ValueError(f"Could not convert string '{raw}' to {name}")
        return str(vals.index(raw))
    e = operand.strip()
    whens = " ".join(
        f"WHEN {e} = '{v.replace(chr(39), chr(39) * 2)}' THEN {i}"
        for i, v in enumerate(vals)
    )
    return (
        f"(CASE WHEN {e} IS NULL THEN NULL {whens} "
        f"ELSE raise_error(concat('Could not convert string ''', "
        f"{e}, ''' to {name}')) END)"
    )


def _top_select_items(prot: str) -> list[str] | None:
    """The statement's own top-level select items (for ordinal ORDER BY
    resolution), or None when the statement is not a plain SELECT or a
    top-level set operation follows (there the ordinal references the
    MERGED output — try_rewrite_enum_setop_order handles that at the
    DataFrame level). Runs on literal-protected text."""
    from vscode_parquet_visualizer_spark.plans.dialect import (
        _split_top_level,
    )

    m = re.match(r"\s*SELECT\b(?:\s+DISTINCT\b)?", prot, re.IGNORECASE)
    if m is None:
        return None
    sel_end = None
    depth = 0
    i = m.end()
    while i < len(prot):
        ch = prot[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and (ch.isalpha() or ch == "_")
            and not (prot[i - 1].isalnum() or prot[i - 1] in "_.")
        ):
            km = re.match(
                r"(FROM|WHERE|GROUP|HAVING|QUALIFY|WINDOW|ORDER|LIMIT"
                r"|OFFSET|FETCH|UNION|INTERSECT|EXCEPT)\b",
                prot[i:],
                re.IGNORECASE,
            )
            if km:
                kw = km.group(1).upper()
                if kw in ("UNION", "INTERSECT"):
                    return None
                if kw == "EXCEPT":
                    # DuckDB also spells projection exclusion
                    # ``SELECT * EXCEPT (cols)`` — only the set-op form
                    # (followed by SELECT/ALL/DISTINCT or a
                    # parenthesized SELECT) disqualifies
                    tail = prot[i + km.end(1) :].lstrip()
                    if re.match(
                        r"(?:ALL\b|DISTINCT\b|SELECT\b|\(\s*SELECT\b)",
                        tail,
                        re.IGNORECASE,
                    ):
                        return None
                elif sel_end is None:
                    sel_end = i
            while i < len(prot) and (prot[i].isalnum() or prot[i] == "_"):
                i += 1
            continue
        i += 1
    text = prot[m.end() : sel_end if sel_end is not None else len(prot)]
    return _split_top_level(text)


def _rewrite_enum_ordering(
    prot: str, stash: list[str], name: str, vals: list[str]
) -> str:
    """Order-sensitive enum sites → member-index expressions (runs on
    literal-protected text, before the cast-stripping passes).

    1. ``a::name  <|<=|>|>=  b::name`` — both sides become indexes.
    2. ``ORDER BY x::name [ASC|DESC|NULLS …]`` items — the cast becomes
       the index (the cell itself isn't projected by the sort item).
    3. ``ORDER BY alias`` where the select list defines
       ``expr::name AS alias`` — the item becomes an index CASE over
       the alias (Spark resolves select aliases inside ORDER BY
       expressions; probed r11).
    4. ``min(x::name)`` / ``max(x::name)`` (plain aggregate or with an
       OVER clause) — aggregate the member INDEX, then map the winning
       index back to its member string (r11 verdict item 7: these
       stayed lexicographic).
    5. Window ``ORDER BY x::name ROWS/RANGE/GROUPS …`` — the frame
       keywords end the sort item (they used to ride along and defeat
       the item match).
    6. ``ORDER BY <ordinal>`` where the statement's select item at that
       position is an enum cast (no set operation at top level — the
       set-op form routes at the DataFrame level,
       try_rewrite_enum_setop_order).
    Out of scope (documented): enum ordering through a set operation
    whose ORDER BY references neither an alias nor an ordinal the
    gateway can resolve."""
    opnd = _ENUM_OPND
    # 4. min/max over enum casts (incl. the OVER form): aggregate the
    # index, map back to the member string
    vesc = [v.replace("'", "''") for v in vals]
    back = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(vesc))
    agg_pat = re.compile(
        rf"\b(?P<fn>min|max)\s*\(\s*(?P<o>{opnd})\s*::\s*{name}\s*\)"
        rf"(?P<over>\s*OVER\s*(?:[A-Za-z_]\w*"
        rf"|\((?:[^()]|\([^()]*\))*\)))?",
        re.IGNORECASE,
    )
    prot = agg_pat.sub(
        lambda m: (
            f"(CASE ({m.group('fn')}"
            f"({_enum_index_expr(m.group('o'), stash, name, vals)})"
            f"{m.group('over') or ''}) {back} END)"
        ),
        prot,
    )
    # 1. comparisons between two enum casts
    cmp_pat = re.compile(
        rf"(?P<l>{opnd})\s*::\s*{name}\s*(?P<op><=|>=|<|>)\s*"
        rf"(?P<r>{opnd})\s*::\s*{name}\b",
        re.IGNORECASE,
    )
    prot = cmp_pat.sub(
        lambda m: (
            f"{_enum_index_expr(m.group('l'), stash, name, vals)} "
            f"{m.group('op')} "
            f"{_enum_index_expr(m.group('r'), stash, name, vals)}"
        ),
        prot,
    )
    # aliases of enum casts in the select list
    aliases = {
        m.group(1).lower()
        for m in re.finditer(
            rf"{opnd}\s*::\s*{name}\s+AS\s+([A-Za-z_]\w*)",
            prot,
            re.IGNORECASE,
        )
    }
    # 2/3/6. ORDER BY items
    top_items = _top_select_items(prot)
    out = []
    pos = 0
    for ob in re.finditer(r"\bORDER\s+BY\s+", prot, re.IGNORECASE):
        if ob.start() < pos:
            continue
        head = prot[: ob.start()]
        at_top = head.count("(") == head.count(")")
        out.append(prot[pos : ob.end()])
        i = ob.end()
        depth = 0
        item_start = i
        items: list[str] = []
        while i <= len(prot):
            ch = prot[i] if i < len(prot) else ""
            ended = i == len(prot)
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    ended = True
                else:
                    depth -= 1
            elif depth == 0 and ch == ",":
                items.append(prot[item_start:i] + ",")
                item_start = i + 1
            elif depth == 0 and re.match(
                r"(?:LIMIT|OFFSET|FETCH|FOR|ROWS|RANGE|GROUPS)\b",
                prot[i:],
                re.IGNORECASE,
            ) and (i == 0 or not (prot[i - 1].isalnum() or prot[i - 1] == "_")):
                # ROWS/RANGE/GROUPS: a window frame after the OVER
                # clause's last sort item (it used to ride along inside
                # the item and defeat the enum-cast match)
                ended = True
            if ended:
                items.append(prot[item_start:i])
                break
            i += 1

        def fix_item(item: str) -> str:
            trail = ""
            if item.endswith(","):
                item, trail = item[:-1], ","
            m = re.fullmatch(
                rf"(\s*)(?P<o>{opnd})\s*::\s*{name}\b"
                rf"(?P<tail>(?:\s+(?:ASC|DESC|NULLS\s+(?:FIRST|LAST)))*\s*)",
                item,
                re.IGNORECASE,
            )
            if m is not None:
                return (
                    m.group(1)
                    + _enum_index_expr(m.group("o"), stash, name, vals)
                    + m.group("tail")
                    + trail
                )
            dm = re.fullmatch(
                r"(\s*)(?P<n>\d+)"
                r"(?P<tail>(?:\s+(?:ASC|DESC|NULLS\s+(?:FIRST|LAST)))*\s*)",
                item,
                re.IGNORECASE,
            )
            if dm is not None and at_top and top_items:
                # ordinal item: resolve against the statement's own
                # top-level select list (only at top level — a nested
                # subquery's ordinal refers to ITS select list, and a
                # window ORDER BY's integer is a constant, not an
                # ordinal)
                ordn = int(dm.group("n"))
                if 1 <= ordn <= len(top_items):
                    im = re.fullmatch(
                        rf"\s*(?P<o>{opnd})\s*::\s*{name}"
                        rf"(?:\s+AS\s+[A-Za-z_]\w*)?\s*",
                        top_items[ordn - 1],
                        re.IGNORECASE,
                    )
                    if im is not None:
                        return (
                            dm.group(1)
                            + _enum_index_expr(
                                im.group("o"), stash, name, vals
                            )
                            + dm.group("tail")
                            + trail
                        )
                return item + trail
            am = re.fullmatch(
                r"(\s*)(?P<a>[A-Za-z_]\w*)"
                r"(?P<tail>(?:\s+(?:ASC|DESC|NULLS\s+(?:FIRST|LAST)))*\s*)",
                item,
                re.IGNORECASE,
            )
            if am is not None and am.group("a").lower() in aliases:
                whens = " ".join(
                    f"WHEN {am.group('a')} = "
                    f"'{v.replace(chr(39), chr(39) * 2)}' THEN {i}"
                    for i, v in enumerate(vals)
                )
                return (
                    am.group(1)
                    + f"(CASE {whens} END)"
                    + am.group("tail")
                    + trail
                )
            return item + trail

        out.append("".join(fix_item(it) for it in items))
        pos = i
    out.append(prot[pos:])
    return "".join(out)


def try_rewrite_enum_setop_order(
    spark: SparkSession, sql: str, run_sql, **kw
) -> DataFrame | None:
    """``<set-op of enum-cast branches> ORDER BY 1 [LIMIT n]`` — the
    ordinal references the MERGED output column, which no textual
    rewrite can reach (the output name of an aliasless cast is not
    knowable before execution). Route at the DataFrame level instead:
    run the set operation without its tail, then sort on the output
    column BY POSITION through a member-index CASE (r11 verdict item
    7: this stayed lexicographic). Alias items resolve by name; any
    other item shape falls back to the normal textual path."""
    enums = {
        name: vals
        for (sid, name), vals in _session_enums.items()
        if sid == id(spark)
    }
    if not enums:
        return None
    if not re.search(
        r"\b(UNION|INTERSECT|EXCEPT)\b", sql, re.IGNORECASE
    ) or not re.search(r"\bORDER\s+BY\b", sql, re.IGNORECASE):
        return None
    from pyspark.sql import functions as F

    from vscode_parquet_visualizer_spark.plans.dialect import (
        _protect_literals,
        _restore_literals,
        _split_top_level,
    )

    prot, stash = _protect_literals(sql.rstrip().rstrip(";"))
    if not re.match(r"\s*SELECT\b", prot, re.IGNORECASE):
        return None
    # top-level scan: first set-op keyword, last ORDER BY, LIMIT/OFFSET
    depth = 0
    first_setop = None
    order_pos = None
    tail_pos = None
    i = 0
    while i < len(prot):
        ch = prot[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and (ch.isalpha() or ch == "_")
            and (i == 0 or not (prot[i - 1].isalnum() or prot[i - 1] in "_."))
        ):
            km = re.match(
                r"(UNION|INTERSECT|EXCEPT|ORDER\s+BY|LIMIT|OFFSET|FETCH)\b",
                prot[i:],
                re.IGNORECASE,
            )
            if km:
                kw_name = re.sub(r"\s+", " ", km.group(1).upper())
                if kw_name in ("UNION", "INTERSECT", "EXCEPT"):
                    if kw_name == "EXCEPT" and not re.match(
                        r"(?:ALL\b|DISTINCT\b|SELECT\b|\(\s*SELECT\b)",
                        prot[i + km.end(1) :].lstrip(),
                        re.IGNORECASE,
                    ):
                        pass  # SELECT * EXCEPT (cols) projection form
                    elif first_setop is None:
                        first_setop = i
                elif kw_name == "ORDER BY":
                    order_pos = (i, i + km.end(1))
                    tail_pos = None
                elif tail_pos is None and order_pos is not None:
                    tail_pos = i
            while i < len(prot) and (prot[i].isalnum() or prot[i] == "_"):
                i += 1
            continue
        i += 1
    if first_setop is None or order_pos is None or order_pos[0] < first_setop:
        return None
    first_items = _top_select_items(prot[:first_setop])
    if not first_items:
        return None

    def _enum_of(item_text: str) -> tuple[list[str], str | None] | None:
        for name, vals in enums.items():
            im = re.fullmatch(
                rf"\s*(?:{_ENUM_OPND})\s*::\s*{name}"
                rf"(?:\s+AS\s+(?P<a>[A-Za-z_]\w*))?\s*",
                item_text,
                re.IGNORECASE,
            )
            if im is not None:
                return vals, im.group("a")
        return None

    items_text = prot[
        order_pos[1] : tail_pos if tail_pos is not None else len(prot)
    ]
    tail_text = prot[tail_pos:] if tail_pos is not None else ""
    limit = offset = None
    if tail_text.strip():
        tm = re.fullmatch(
            r"\s*(?:LIMIT\s+(?P<l>\d+))?\s*(?:OFFSET\s+(?P<o>\d+))?\s*",
            tail_text,
            re.IGNORECASE,
        )
        if tm is None or (tm.group("l") is None and tm.group("o") is None):
            return None
        limit = int(tm.group("l")) if tm.group("l") else None
        offset = int(tm.group("o")) if tm.group("o") else None
    plans: list[tuple[object, str, bool, bool | None]] = []
    alias_map = {
        (a or "").lower(): it for it in first_items
        for a in [
            (re.search(r"\s+AS\s+([A-Za-z_]\w*)\s*$", it, re.IGNORECASE)
             or [None, None])[1]
        ]
        if a
    }
    # DuckDB's DERIVED output name for an aliasless enum cast is the
    # quoted identifier ``"CAST(<operand> AS <type>)"`` — the only
    # handle (besides an ordinal) the merged set-op column has. Map
    # those names to (position, member list) so ``ORDER BY "CAST(m AS
    # mood)"`` sorts by member index, and record the bare operand
    # names: DuckDB REFUSES ``ORDER BY m`` through a set-op (Binder
    # Error), so the engine must raise the same way rather than let
    # the textual path sort the enum cells lexicographically (r12
    # verdict item 3 — the last silent enum divergence).
    derived_map: dict[str, tuple[int, list[str]]] = {}
    bare_operands: set[str] = set()
    plain_names: set[str] = set()  # names another item DOES provide
    for idx, fit in enumerate(first_items):
        t = fit.strip()
        if re.search(r"\s+AS\s+[A-Za-z_]\w*\s*$", t, re.IGNORECASE):
            continue  # aliased: handled via alias_map
        if re.fullmatch(r"[A-Za-z_][\w.]*", t):
            plain_names.add(t.split(".")[-1].lower())
            continue
        for name, vals in enums.items():
            cm = re.fullmatch(
                rf"\s*(?P<o>{_ENUM_OPND})\s*::\s*{name}\s*"
                rf"|\s*CAST\s*\(\s*(?P<o2>{_ENUM_OPND})\s+AS\s+{name}"
                rf"\s*\)\s*",
                t,
                re.IGNORECASE,
            )
            if cm is None:
                continue
            opnd = (cm.group("o") or cm.group("o2")).strip()
            opnd_txt = _restore_literals(opnd, stash, form="duck")
            derived_map[f"cast({opnd_txt.lower()} as {name.lower()})"] = (
                idx,
                vals,
            )
            if re.fullmatch(r"[A-Za-z_]\w*", opnd_txt):
                bare_operands.add(opnd_txt.lower())
            break
    for it in _split_top_level(items_text):
        im = re.fullmatch(
            r"\s*(?P<b>\d+|[A-Za-z_]\w*|\x00IDQ\d+\x00)"
            r"(?P<sfx>(?:\s+(?:ASC|DESC|NULLS\s+FIRST|NULLS\s+LAST))*)\s*,?\s*",
            it,
            re.IGNORECASE,
        )
        if im is None:
            return None
        body = im.group("b")
        sfx = re.sub(r"\s+", " ", im.group("sfx").upper())
        desc = "DESC" in sfx
        nulls_first = "NULLS FIRST" in sfx
        if body.isdigit():
            ordn = int(body)
            if not (1 <= ordn <= len(first_items)):
                return None
            src = ("pos", ordn - 1)
            em = _enum_of(first_items[ordn - 1])
        elif body.startswith("\x00"):
            raw = stash[int(body[4:-1])]
            qname = raw[1:-1].replace('""', '"')
            key = re.sub(r"\s+", " ", qname.strip().lower())
            if key in alias_map:
                src = ("name", qname)
                em = _enum_of(alias_map[key])
            elif key in derived_map:
                idx2, vals = derived_map[key]
                src = ("pos", idx2)
                em = (vals, None)
            else:
                return None  # unknown quoted handle: normal path
        else:
            if (
                body.lower() in bare_operands
                and body.lower() not in alias_map
                and body.lower() not in plain_names
            ):
                raise ValueError(
                    f'Could not ORDER BY column "{body}": it is the '
                    "operand of an aliasless enum cast inside a set "
                    "operation, which has no output name. Reference it "
                    "by ordinal, alias the cast, or use the derived "
                    'name "CAST(… AS …)" (DuckDB raises a Binder Error '
                    "here; sorting the merged column by name would "
                    "lose the enum member order)"
                )
            src = ("name", body)
            em = (
                _enum_of(alias_map[body.lower()])
                if body.lower() in alias_map
                else None
            )
        plans.append((src, em[0] if em else None, desc, nulls_first))
    if not any(vals for _, vals, _, _ in plans):
        return None  # no enum involvement: normal path
    inner = _restore_literals(prot[: order_pos[0]], stash, form="duck")
    df = run_sql(spark, inner, **kw)
    sort_cols = []
    for (kind, ref), vals, desc, nulls_first in plans:
        if kind == "pos":
            if ref >= len(df.columns):
                return None
            col = F.col(df.columns[ref])
        else:
            col = F.col(ref)
        if vals:
            c = F.when(F.lit(False), F.lit(0))
            for idx, v in enumerate(vals):
                c = c.when(col == v, idx)
            col = c
        if desc:
            col = col.desc_nulls_first() if nulls_first else col.desc_nulls_last()
        else:
            # DuckDB default null order: NULLS LAST in both directions
            col = col.asc_nulls_first() if nulls_first else col.asc_nulls_last()
        sort_cols.append(col)
    out = df.orderBy(*sort_cols)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def substitute_enums(spark: SparkSession, sql: str) -> str:
    """Lower casts to session ENUM types: the engine's enum cells are
    their member strings. A string-literal operand is validated at
    rewrite time (loud ConversionError parity) in BOTH the ``::`` and
    ``CAST(… AS enum)`` spellings (ADVICE r10: the CAST spelling was
    blindly rewritten to STRING, so ``CAST('zebra' AS mood)`` silently
    succeeded); a column/expression operand gets a runtime membership
    CASE with raise_error. ``TRY_CAST`` NULLs a non-member (DuckDB's
    semantics) via a membership CASE without raise_error. Runs over
    literal-protected text so enum-cast-like spellings inside string
    data are never touched."""
    enums = {
        name: vals
        for (sid, name), vals in _session_enums.items()
        if sid == id(spark)
    }
    if not enums:
        return sql
    from vscode_parquet_visualizer_spark.plans.dialect import (
        _protect_literals,
        _restore_literals,
    )

    prot, stash = _protect_literals(sql)

    def member_of(ph_idx: str, vals: list[str], name: str) -> str:
        raw = stash[int(ph_idx)][1:-1].replace("''", "'")
        if raw not in vals:
            raise ValueError(
                f"Could not convert string '{raw}' to {name}"
            )
        return f"\x00LIT{ph_idx}\x00"

    def runtime_check(expr: str, members: str, name: str) -> str:
        return (
            f"(CASE WHEN {expr} IS NULL OR {expr} IN ({members}) "
            f"THEN {expr} "
            f"ELSE raise_error(concat('Could not convert string ''', "
            f"{expr}, ''' to {name}')) END)"
        )

    for name, vals in enums.items():
        members = ", ".join("'" + v.replace("'", "''") + "'" for v in vals)
        # ordering semantics FIRST (r10 verdict item 5): DuckDB compares
        # enums by MEMBER INDEX, not cell text — rewrite order-sensitive
        # comparison operators between enum casts, and ORDER BY items
        # that are enum casts (or aliases of them), through the member
        # index before the casts are stripped below. =/<> are
        # order-independent and stay on the cell strings.
        prot = _rewrite_enum_ordering(prot, stash, name, vals)
        lit_pat = re.compile(
            r"\x00LIT(\d+)\x00\s*::\s*" + name + r"\b", re.IGNORECASE
        )
        prot = lit_pat.sub(
            lambda m, vals=vals, name=name: member_of(m.group(1), vals, name),
            prot,
        )
        call_pat = re.compile(
            r"([A-Za-z_][\w.]*\s*\((?:[^()]|\([^()]*\)"
            r"|\((?:[^()]|\([^()]*\))*\))*\))\s*::\s*" + name + r"\b",
            re.IGNORECASE,
        )

        def call_sub(m, members=members, name=name):
            # a GENERATOR call can't be duplicated inside the
            # membership CASE (Spark allows one generator per select
            # item). unnest: validate the LIST ARGUMENT element-wise
            # instead — a lambda runs before the explode, so members
            # are checked without duplicating the generator (r11
            # verdict item 7: the cast used to strip unvalidated).
            # generate_series/range yield numbers, never enum members —
            # loud bind-time parity with DuckDB's conversion error.
            um = re.match(r"unnest\s*\((.*)\)\s*$", m.group(1),
                          re.IGNORECASE | re.DOTALL)
            if um is not None:
                return (
                    f"unnest(list_transform({um.group(1)}, __ev -> "
                    f"(CASE WHEN __ev IS NULL OR __ev IN ({members}) "
                    f"THEN __ev "
                    f"ELSE raise_error(concat('Could not convert "
                    f"string ''', __ev, ''' to {name}')) END)))"
                )
            if re.match(
                r"(?:generate_series|range)\s*\(", m.group(1), re.IGNORECASE
            ):
                raise ValueError(
                    f"Could not convert series value to {name}"
                )
            return runtime_check(m.group(1), members, name)

        prot = call_pat.sub(call_sub, prot)
        col_pat = re.compile(
            r"([A-Za-z_][\w.]*)\s*::\s*" + name + r"\b", re.IGNORECASE
        )
        prot = col_pat.sub(
            lambda m, members=members, name=name: runtime_check(
                m.group(1), members, name
            ),
            prot,
        )

        def cast_sub(
            m: re.Match, vals=vals, members=members, name=name
        ) -> str:
            is_try = bool(m.group(1))
            operand = m.group(2).strip()
            if is_try:
                # DuckDB: TRY_CAST of a non-member → NULL, no error
                return (
                    f"(CASE WHEN CAST({operand} AS STRING) IN ({members}) "
                    f"THEN CAST({operand} AS STRING) END)"
                )
            pm = re.fullmatch(r"\x00LIT(\d+)\x00", operand)
            if pm is not None:
                return f"CAST({member_of(pm.group(1), vals, name)} AS STRING)"
            if re.fullmatch(r"NULL", operand, re.IGNORECASE):
                return "CAST(NULL AS STRING)"
            return f"CAST({runtime_check(operand, members, name)} AS STRING)"

        prot = re.sub(
            r"\b(TRY_)?CAST\s*\(((?:[^()]|\([^()]*\))*?)\s+AS\s+"
            + name
            + r"\b\s*\)",
            cast_sub,
            prot,
            flags=re.IGNORECASE,
        )
    return _restore_literals(prot, stash, form="duck")


_CREATE_MACRO = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?"
    r"(?:MACRO|FUNCTION)\s+(?P<name>[A-Za-z_]\w*)\s*\((?P<params>[^)]*)\)"
    r"\s*AS\s+(?P<body>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_MACRO = re.compile(
    r"^\s*DROP\s+(?:MACRO|FUNCTION)\s+(?P<ifex>IF\s+EXISTS\s+)?"
    r"(?P<name>[A-Za-z_]\w*)\s*$",
    re.IGNORECASE,
)

# session-scoped macros: id(spark) → {lower_name: (params, body, is_table)}
# where params is a list of (name, default_text_or_None) — DuckDB's
# `name := value` parameter defaults ride along as raw expression text.
_session_macros: dict[
    int, dict[str, tuple[list[tuple[str, str | None]], str, bool]]
] = {}


def session_macros(
    spark: SparkSession,
) -> dict[str, tuple[list[tuple[str, str | None]], str, bool]]:
    return _session_macros.setdefault(id(spark), {})


def _parse_macro_params(text: str) -> list[tuple[str, str | None]]:
    """``a, b := 10`` → [('a', None), ('b', '10')]; loud on bad shapes."""
    params: list[tuple[str, str | None]] = []
    for p in (x.strip() for x in text.split(",") if x.strip()):
        name, sep, default = p.partition(":=")
        name = name.strip()
        if not re.fullmatch(r"[A-Za-z_]\w*", name):
            raise NotImplementedError(
                f"unsupported macro parameter shape {p!r}"
            )
        params.append((name, default.strip() if sep else None))
    return params


def _bind_args(
    params: list[tuple[str, str | None]], args: list[str]
) -> dict[str, str] | None:
    """Map parameter names to argument texts: positional args first,
    then DuckDB's named ``name := value`` call form, then declaration
    defaults. None (→ call left unexpanded, loud) on arity/name errors
    or a positional arg after a named one."""
    named: dict[str, str] = {}
    pos: list[str] = []
    for a in args:
        m = re.match(r"^\s*([A-Za-z_]\w*)\s*:=\s*(.+)$", a, re.DOTALL)
        if m is not None:
            named[m.group(1).lower()] = m.group(2).strip()
        elif named:
            return None
        else:
            pos.append(a)
    if len(pos) > len(params):
        return None
    bound: dict[str, str] = {}
    for (name, default), val in zip(params, pos):
        bound[name.lower()] = val
    for name, default in params[len(pos):]:
        key = name.lower()
        if key in named:
            bound[key] = named.pop(key)
        elif default is not None:
            bound[key] = default
        else:
            return None
    return None if named else bound


def expand_macros(spark: SparkSession, sql: str, _depth: int = 0) -> str:
    """Textually expand scalar-macro calls (DuckDB ``CREATE MACRO`` —
    an untyped expression template, so expansion happens in the GATEWAY
    before transpilation, engine-independently): each call becomes the
    macro body with parameter identifiers substituted by the
    parenthesized argument texts. Macros may reference macros (depth
    capped). Wrong arity leaves the call unexpanded → a loud
    unresolved-function error downstream."""
    from vscode_parquet_visualizer_spark.plans.dialect import (
        _LITERAL,
        _protect_literals,
        _restore_literals,
        _rewrite_calls,
    )

    macros = _session_macros.get(id(spark))
    if not macros or _depth > 8:
        return sql
    # _rewrite_calls requires literal-protected text: an unprotected
    # comma inside a quoted argument mis-splits the arg list, and a
    # param name inside a string literal in the macro BODY would get
    # substituted. One shared stash covers the query and every body.
    out, stash = _protect_literals(sql)

    def protect_into(text: str) -> str:
        def keep(m: re.Match) -> str:
            stash.append(m.group(0))
            return f"\x00LIT{len(stash) - 1}\x00"

        return _LITERAL.sub(keep, text)

    def substitute(body: str, bound: dict[str, str]) -> str:
        expanded = body
        for p, a in bound.items():
            # bare identifiers/literals substitute unparenthesized —
            # extra parens would defeat identifier-anchored dialect
            # rewrites ((x)[1:1] misses the 1-based subscript rule);
            # anything else gets precedence parens
            rep = (
                a
                if re.fullmatch(r"[\w.']+|\x00LIT\d+\x00", a)
                else f"({a})"
            )
            expanded = re.sub(
                rf"(?<![\w.]){re.escape(p)}(?![\w(])",
                rep.replace("\\", "\\\\"),
                expanded,
                flags=re.IGNORECASE,
            )
        return expanded

    for name, (params, raw_body, is_table) in macros.items():
        body = protect_into(raw_body)

        if is_table:
            # table macros are relations: expand at FROM/JOIN position
            # into a named derived table (DuckDB binds the macro name as
            # the relation alias unless the call carries its own).
            out = _expand_table_macro(out, name, params, body, substitute)
            continue

        def sub(args, params=params, body=body):
            if args == [""]:
                args = []  # zero-arg call: name() splits to one empty arg
            bound = _bind_args(params, args)
            if bound is None:
                return None
            return f"({substitute(body, bound)})"

        out = _rewrite_calls(out, name, sub)
    out = _restore_literals(out, stash, form="duck")
    if out != sql:  # macros calling macros: iterate to fixpoint
        return expand_macros(spark, out, _depth + 1)
    return out


def _expand_table_macro(
    sql: str, name: str, params, body: str, substitute
) -> str:
    """Replace ``FROM|JOIN <name>(args)`` with the parameter-substituted
    macro body as a derived table. Keeps a user alias if one follows the
    call; otherwise aliases by the macro name (DuckDB's binding)."""
    from vscode_parquet_visualizer_spark.plans.dialect import (
        _balanced_span,
        _split_top_level,
    )

    pat = re.compile(rf"\b(FROM|JOIN)\s+{name}\s*\(", re.IGNORECASE)
    out, pos, n_call = [], 0, 0
    while True:
        m = pat.search(sql, pos)
        if m is None:
            out.append(sql[pos:])
            return "".join(out)
        open_idx = m.end() - 1
        close_idx = _balanced_span(sql, open_idx)
        if close_idx == -1:
            out.append(sql[pos:])
            return "".join(out)
        arg_text = sql[open_idx + 1 : close_idx].strip()
        args = _split_top_level(arg_text) if arg_text else []
        bound = _bind_args(params, [a.strip() for a in args])
        if bound is None:  # arity/name error: leave the call (loud)
            out.append(sql[pos : close_idx + 1])
            pos = close_idx + 1
            continue
        after = sql[close_idx + 1 :]
        has_alias = re.match(
            r"\s+(?:AS\s+)?(?!WHERE\b|GROUP\b|ORDER\b|LIMIT\b|OFFSET\b"
            r"|JOIN\b|ON\b|USING\b|UNION\b|INTERSECT\b|EXCEPT\b|LEFT\b"
            r"|RIGHT\b|FULL\b|INNER\b|CROSS\b|QUALIFY\b|HAVING\b|WINDOW\b)"
            r"[A-Za-z_]\w*",
            after,
            re.IGNORECASE,
        )
        # synthetic alias, NOT the macro name: DuckDB binds an unnamed
        # relation here, so macro-name-qualified column refs must fail
        # on both engines the same way.
        alias = "" if has_alias else f" __tm_{name}{n_call}"
        n_call += 1
        out.append(sql[pos : m.start()])
        out.append(f"{m.group(1)} ({substitute(body, bound)}){alias}")
        pos = close_idx + 1


def try_rewrite_ddl(
    spark: SparkSession, sql: str, run_sql, **kw
) -> DataFrame | None:
    """Route a DDL/COPY/SHOW statement; None if ``sql`` is none of them.
    ``run_sql`` is the gateway entry point (passed in to avoid a module
    cycle); ``kw`` carries its view/columns/dataset_path binding."""
    out = _try_rewrite_ddl(spark, sql, run_sql, **kw)
    if out is not None:
        # any routed statement may have (re)registered a relation —
        # invalidate rank_sql's size/NDV gate-probe caches so a later
        # window query over the same text re-probes the new data
        # (over-clearing on SHOW/DESCRIBE is harmless: it is a cache)
        from vscode_parquet_visualizer_spark.plans.rank_sql import (
            note_catalog_change,
        )

        note_catalog_change()
    return out


def _try_rewrite_ddl(
    spark: SparkSession, sql: str, run_sql, **kw
) -> DataFrame | None:
    m = _CREATE_MACRO.match(sql)
    if m is not None:
        body = m.group("body").strip()
        tm = re.match(r"TABLE\b\s*", body, re.IGNORECASE)
        is_table = tm is not None
        if is_table:
            body = body[tm.end():].strip()
        params = _parse_macro_params(m.group("params"))
        session_macros(spark)[m.group("name").lower()] = (
            params, body, is_table,
        )
        return local_df(spark, [], _SUCCESS_SCHEMA)

    m = _DROP_MACRO.match(sql)
    if m is not None:
        removed = session_macros(spark).pop(m.group("name").lower(), None)
        if removed is None and not m.group("ifex"):
            raise ValueError(
                f'Macro with name "{m.group("name")}" does not exist'
            )
        return local_df(spark, [], _SUCCESS_SCHEMA)
    m = _CREATE_SEQ.match(sql)
    if m is not None and not re.match(
        r"\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?"
        r"(?:TABLE|VIEW|MACRO|FUNCTION|INDEX|TYPE)\b",
        sql,
        re.IGNORECASE,
    ):
        key = (id(spark), m.group("name").lower())
        if key in _session_sequences and m.group("ifnex"):
            return local_df(spark, [], _SUCCESS_SCHEMA)
        opts = m.group("opts") or ""
        start = inc = None
        om = re.search(r"\bSTART\s+(?:WITH\s+)?(-?\d+)", opts, re.IGNORECASE)
        if om:
            start = int(om.group(1))
        om = re.search(r"\bINCREMENT\s+(?:BY\s+)?(-?\d+)", opts, re.IGNORECASE)
        if om:
            inc = int(om.group(1))
        mx = re.search(r"\bMAXVALUE\s+(-?\d+)", opts, re.IGNORECASE)
        mn = re.search(r"\bMINVALUE\s+(-?\d+)", opts, re.IGNORECASE)
        inc = 1 if inc is None else inc
        if start is None:
            # DuckDB: ascending sequences start at MINVALUE/1,
            # descending at MAXVALUE/-1
            start = (
                (int(mn.group(1)) if mn else 1)
                if inc > 0
                else (int(mx.group(1)) if mx else -1)
            )
        _session_sequences[key] = {
            "next": start,
            "inc": inc,
            "max": int(mx.group(1)) if mx else None,
            "min": int(mn.group(1)) if mn else None,
            "curr": None,
        }
        return local_df(spark, [], _SUCCESS_SCHEMA)

    m = _DROP_SEQ.match(sql)
    if m is not None:
        removed = _session_sequences.pop(
            (id(spark), m.group("name").lower()), None
        )
        if removed is None and not m.group("ifex"):
            raise ValueError(
                f'Sequence with name {m.group("name")} does not exist!'
            )
        return local_df(spark, [], _SUCCESS_SCHEMA)

    m = _CREATE_ENUM.match(sql)
    if m is not None:
        from vscode_parquet_visualizer_spark.plans.dialect import (
            _split_top_level,
        )

        vals = [
            v.strip()[1:-1].replace("''", "'")
            for v in _split_top_level(m.group("vals"))
            if v.strip().startswith("'")
        ]
        _session_enums[(id(spark), m.group("name").lower())] = vals
        return local_df(spark, [], _SUCCESS_SCHEMA)

    m = _DROP_TYPE.match(sql)
    if m is not None:
        removed = _session_enums.pop(
            (id(spark), m.group("name").lower()), None
        )
        if removed is None and not m.group("ifex"):
            raise ValueError(
                f'Type with name {m.group("name")} does not exist!'
            )
        return local_df(spark, [], _SUCCESS_SCHEMA)

    m = _PREPARE.match(sql)
    if m is not None:
        _session_prepared[(id(spark), m.group("name").lower())] = m.group(
            "body"
        ).strip()
        return local_df(spark, [], _SUCCESS_SCHEMA)

    m = _EXECUTE.match(sql)
    if m is not None:
        name = m.group("name").lower()
        body = _session_prepared.get((id(spark), name))
        if body is None:
            raise ValueError(
                f'Prepared statement "{m.group("name")}" does not exist'
            )
        return run_sql(
            spark, _bind_prepared(body, m.group("args") or ""), **kw
        )

    m = _DEALLOCATE.match(sql)
    if m is not None:
        _session_prepared.pop((id(spark), m.group("name").lower()), None)
        return local_df(spark, [], _SUCCESS_SCHEMA)

    if _SESSION_NOOP.match(sql):
        # Transaction control / storage maintenance are meaningful to a
        # persistent DuckDB but no-ops for this session-scoped engine
        # (temp views + cached DataFrames, nothing durable to
        # checkpoint or roll back). DuckDB returns an empty result for
        # them; mirror with the empty Success shape rather than a parse
        # error mid-script.
        return local_df(spark, [], _SUCCESS_SCHEMA)

    if _SHOW_TABLES.match(sql):
        names = sorted(
            t.name for t in spark.catalog.listTables() if not t.name.startswith("__")
        )
        return spark.createDataFrame(
            [(n,) for n in names],
            T.StructType([T.StructField("name", T.StringType())]),
        ).coalesce(1)

    m = _DROP.match(sql)
    if m is not None:
        name = m.group("name")
        existed = spark.catalog.dropTempView(name)
        key = (id(spark), name.lower())
        cached = _session_tables.pop(key, None)
        if cached is not None:
            cached.unpersist()
        if not existed and not m.group("ifex"):
            raise ValueError(
                f'{m.group("kind").capitalize()} with name "{name}" does not exist'
            )
        return local_df(spark, [], _SUCCESS_SCHEMA)

    m = _PRAGMA_TABLE_INFO.match(sql)
    if m is not None:
        return table_info_df(spark, m.group("name"))

    if _PRAGMA_SHOW_TABLES.match(sql):
        # identical shape to SHOW TABLES (DuckDB: one sorted name column)
        names = sorted(
            t.name for t in spark.catalog.listTables() if not t.name.startswith("__")
        )
        return spark.createDataFrame(
            [(n,) for n in names],
            T.StructType([T.StructField("name", T.StringType())]),
        ).coalesce(1)

    if _PRAGMA_SHOW_TABLES_EXPANDED.match(sql):
        from vscode_parquet_visualizer_spark.functions.schema_format import (
            duckdb_type_string,
        )

        rows = []
        for t in sorted(
            (t for t in spark.catalog.listTables() if not t.name.startswith("__")),
            key=lambda t: t.name,
        ):
            fields = spark.table(t.name).schema.fields
            rows.append(
                (
                    "memory",
                    "main",
                    t.name,
                    [f.name for f in fields],
                    [duckdb_type_string(f.dataType) for f in fields],
                    t.tableType == "TEMPORARY",
                )
            )
        return spark.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("database", T.StringType()),
                    T.StructField("schema", T.StringType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("column_names", T.ArrayType(T.StringType())),
                    T.StructField("column_types", T.ArrayType(T.StringType())),
                    T.StructField("temporary", T.BooleanType()),
                ]
            ),
        ).coalesce(1)

    m = _SET_STMT.match(sql)
    if m is not None:
        name, value = m.group("name"), m.group("value").rstrip(";").strip()
        if (value.startswith("'") and value.endswith("'")) or (
            value.startswith('"') and value.endswith('"')
        ):
            value = value[1:-1]
        _session_settings.setdefault(id(spark), {})[name.lower()] = value
        if name.lower() == "timezone":
            spark.conf.set("spark.sql.session.timeZone", value)
        return local_df(spark, [], _SUCCESS_SCHEMA)

    m = _RESET_STMT.match(sql)
    if m is not None:
        name = m.group("name").lower()
        _session_settings.get(id(spark), {}).pop(name, None)
        if name == "timezone":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        return local_df(spark, [], _SUCCESS_SCHEMA)

    if _CHECKPOINT_STMT.match(sql):
        return local_df(spark, [], _SUCCESS_SCHEMA)

    if _PRAGMA_VERSION.match(sql):
        import pyspark

        return spark.createDataFrame(
            [(f"spark-{pyspark.__version__}", "")],
            T.StructType(
                [
                    T.StructField("library_version", T.StringType()),
                    T.StructField("source_id", T.StringType()),
                ]
            ),
        ).coalesce(1)

    m = _INSERT.match(sql)
    if m is not None:
        name = m.group("name")
        key = (id(spark), name.lower())
        if not spark.catalog.tableExists(name):
            raise ValueError(f'Table with name "{name}" does not exist')
        body = m.group("body").strip()
        cols_txt = m.group("cols")
        if cols_txt and re.match(
            r"^\s*(SELECT|FROM|WITH|VALUES|TABLE)\b",
            cols_txt[1:-1],
            re.IGNORECASE,
        ):
            # parenthesized QUERY source, not a column list
            body, cols_txt = (cols_txt + " " + body).strip(), None
        # strip a parenthesized wrapper off the source — DuckDB accepts
        # `INSERT INTO t (SELECT …)` (wave 45)
        while (
            body.startswith("(")
            and body.endswith(")")
            and re.match(
                r"^\s*(SELECT|FROM|WITH|VALUES|TABLE)\b",
                body[1:-1],
                re.IGNORECASE,
            )
        ):
            body = body[1:-1].strip()
        if re.match(r"^DEFAULT\s+VALUES$", body, re.IGNORECASE):
            # one row of defaults; CTAS/typed tables carry no DEFAULT
            # clauses (ddl_sql.py:47), so every column is NULL (wave 48)
            tgt = _session_tables.get(key) or spark.table(name)
            body = "SELECT " + ", ".join(
                f"CAST(NULL AS {f.dataType.simpleString()}) AS `{f.name}`"
                for f in tgt.schema.fields
            )
        if not re.match(r"^(SELECT|FROM|WITH|VALUES|TABLE)\b", body, re.IGNORECASE):
            raise ValueError(f"INSERT INTO: cannot parse source {body!r}")
        add = run_sql(spark, body, **kw)
        base = _session_tables.get(key) or spark.table(name)
        if cols_txt:
            # explicit column-list form (wave 45): values bind to the
            # NAMED columns positionally; unmentioned columns fill NULL
            # (the engine's CTAS tables carry no DEFAULT clauses —
            # ddl_sql.py:47)
            from pyspark.sql import functions as F

            names = [
                c.strip().strip('"') for c in cols_txt[1:-1].split(",")
            ]
            lower_map = {c.lower(): c for c in base.columns}
            tgt = [lower_map.get(nm.lower()) for nm in names]
            if None in tgt:
                bad = names[tgt.index(None)]
                raise ValueError(
                    f'INSERT INTO {name}: unknown column "{bad}"'
                )
            if len(add.columns) != len(tgt):
                raise ValueError(
                    f"INSERT INTO {name}: {len(add.columns)} values for "
                    f"{len(tgt)} columns"
                )
            add = add.toDF(*tgt)
            dtypes = dict(base.dtypes)
            for c in base.columns:
                if c not in tgt:
                    add = add.withColumn(c, F.lit(None).cast(dtypes[c]))
            add = add.select(*base.columns)
        else:
            # positional semantics (DuckDB inserts by position);
            # unionByName would silently reorder — align by renaming
            # into the target's column names instead, erroring on arity
            # mismatch like DuckDB.
            if len(add.columns) != len(base.columns):
                raise ValueError(
                    f"INSERT INTO {name}: {len(add.columns)} values for "
                    f"{len(base.columns)} columns"
                )
            add = add.toDF(*base.columns)
        n_new = add.count()
        merged = base.unionByName(add).persist()
        merged.count()
        merged.createOrReplaceTempView(name)
        old = _session_tables.get(key)
        _session_tables[key] = merged
        if old is not None:
            old.unpersist()
        if m.group("ret"):
            # RETURNING: project the inserted rows (DuckDB shape)
            view = f"__ins_ret_{name}"
            add.createOrReplaceTempView(view)
            return run_sql(
                spark, f"SELECT {m.group('ret')} FROM {view}", **kw
            )
        return _count_df(spark, n_new)

    m = _EXPLAIN.match(sql)
    if m is not None:
        df = run_sql(spark, m.group("body"), **kw)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        return spark.createDataFrame(
            [("physical_plan", plan)],
            T.StructType(
                [
                    T.StructField("explain_key", T.StringType()),
                    T.StructField("explain_value", T.StringType()),
                ]
            ),
        ).coalesce(1)

    m = _CTAS.match(sql)
    if m is not None:
        name, kind = m.group("name"), m.group("kind").upper()
        replace = bool(m.group("replace"))
        if not replace and spark.catalog.tableExists(name):
            raise ValueError(f'Table with name "{name}" already exists')
        df = run_sql(spark, m.group("body"), **kw)
        if m.group("cols"):
            aliases = [
                c.strip().strip('"')
                for c in m.group("cols").split(",")
                if c.strip()
            ]
            if len(aliases) != len(df.columns):
                raise ValueError(
                    f"CREATE {kind} {name}: {len(aliases)} column aliases "
                    f"for {len(df.columns)} columns"
                )
            df = df.toDF(*aliases)
        if kind == "VIEW":
            df.createOrReplaceTempView(name)
            return _count_df(spark, None)
        # A5 semantics: materialize atomically — persist + eager count
        # FIRST (a failing query surfaces here), then swap the binding.
        df = df.persist()
        n = df.count()
        key = (id(spark), name.lower())
        old = _session_tables.get(key)
        df.createOrReplaceTempView(name)
        _session_tables[key] = df
        if old is not None:
            old.unpersist()
        return _count_df(spark, n)

    m = _CREATE_TYPED.match(sql)
    if m is not None:
        from vscode_parquet_visualizer_spark.plans.dialect import (
            _split_top_level,
        )

        name = m.group("name")
        if not m.group("replace") and spark.catalog.tableExists(name):
            raise ValueError(f'Table with name "{name}" already exists')
        exprs = []
        for item in _split_top_level(m.group("cols")):
            item = item.strip()
            if not item or re.match(
                r"(PRIMARY|UNIQUE|CHECK|FOREIGN|CONSTRAINT)\b",
                item,
                re.IGNORECASE,
            ):
                continue  # table-level constraint entry
            cm = re.match(r'("([^"]+)"|[A-Za-z_]\w*)\s+(.+)$', item, re.DOTALL)
            if cm is None:
                raise ValueError(f"CREATE TABLE {name}: cannot parse {item!r}")
            col = cm.group(2) or cm.group(1)
            typ = re.sub(
                r"\s+(NOT\s+NULL|NULL|PRIMARY\s+KEY|UNIQUE"
                r"|DEFAULT\s+.*|CHECK\s*\(.*|COLLATE\s+\w+)\s*$",
                "",
                cm.group(3).strip(),
                flags=re.IGNORECASE | re.DOTALL,
            )
            exprs.append(f'CAST(NULL AS {typ}) AS `{col}`')
        if not exprs:
            raise ValueError(f"CREATE TABLE {name}: no columns")
        df = run_sql(
            spark, f"SELECT {', '.join(exprs)} WHERE false", **kw
        )
        _swap_table(spark, name, df)
        return _count_df(spark, 0)

    m = _ALTER.match(sql)
    if m is not None:
        name, action = m.group("name"), m.group("action").strip()
        if not spark.catalog.tableExists(name):
            raise ValueError(f'Table with name "{name}" does not exist')
        cols = spark.table(name).columns
        am = re.match(
            r"ADD\s+COLUMN\s+(?:IF\s+NOT\s+EXISTS\s+)?"
            r'("([^"]+)"|[A-Za-z_]\w*)\s+(.+)$',
            action,
            re.IGNORECASE | re.DOTALL,
        )
        if am is not None:
            col = am.group(2) or am.group(1)
            if col in cols:
                return local_df(spark, [], _SUCCESS_SCHEMA)
            typ = am.group(3).strip().rstrip(";")
            df = run_sql(
                spark,
                f'SELECT *, CAST(NULL AS {typ}) AS `{col}` FROM {name}',
                **kw,
            )
            _swap_table(spark, name, df)
            return local_df(spark, [], _SUCCESS_SCHEMA)
        rm = re.match(
            r"RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*$", action, re.IGNORECASE
        )
        if rm is not None:
            df = spark.table(name).withColumnRenamed(
                rm.group(1), rm.group(2)
            )
            _swap_table(spark, name, df)
            return local_df(spark, [], _SUCCESS_SCHEMA)
        dm = re.match(
            r"DROP\s+(?:COLUMN\s+)?(?:IF\s+EXISTS\s+)?(\w+)\s*$",
            action,
            re.IGNORECASE,
        )
        if dm is not None:
            df = spark.table(name).drop(dm.group(1))
            _swap_table(spark, name, df)
            return local_df(spark, [], _SUCCESS_SCHEMA)
        nm = re.match(r"RENAME\s+TO\s+(\w+)\s*$", action, re.IGNORECASE)
        if nm is not None:
            new = nm.group(1)
            df = spark.table(name)
            _swap_table(spark, new, df)
            spark.catalog.dropTempView(name)
            displaced = _session_tables.pop((id(spark), name.lower()), None)
            if displaced is not None:
                displaced.unpersist()
            return local_df(spark, [], _SUCCESS_SCHEMA)
        raise ValueError(f"ALTER TABLE: unsupported action {action!r}")

    m = _UPDATE.match(sql)
    if m is not None:
        from vscode_parquet_visualizer_spark.plans.dialect import (
            _split_top_level,
        )

        name, pred = m.group("name"), m.group("pred")
        if not spark.catalog.tableExists(name):
            raise ValueError(f'Table with name "{name}" does not exist')
        from vscode_parquet_visualizer_spark.plans.dialect import (
            _protect_literals,
            _restore_literals,
        )

        # literal/identifier-protect the SET list before splitting:
        # a comma or `=` inside a string literal or quoted column name
        # ("c,d" = …) mis-split the assignments, and stripping bare
        # quotes left `""`-doubled names unresolvable — which then
        # SILENTLY matched no column and dropped the assignment
        # (r11 composite fuzz, silent wrong-value class)
        prot_sets, set_stash = _protect_literals(m.group("sets"))
        sets = {}
        for item in _split_top_level(prot_sets):
            col, eq, val = item.partition("=")
            if not eq:
                raise ValueError(f"UPDATE: cannot parse assignment {item!r}")
            col = col.strip()
            idm = re.fullmatch(r"\x00IDQ(\d+)\x00", col)
            if idm is not None:
                colname = set_stash[int(idm.group(1))][1:-1].replace(
                    '""', '"'
                )
            else:
                colname = col.strip('"')
            sets[colname.lower()] = _restore_literals(
                val.strip(), set_stash, form="duck"
            )
        table_cols = {c.lower() for c in spark.table(name).columns}
        unknown = sorted(k for k in sets if k not in table_cols)
        if unknown:
            raise ValueError(
                f'UPDATE {name}: column "{unknown[0]}" does not exist'
            )
        proj = []
        for c in spark.table(name).columns:
            bt = c.replace("`", "``")
            if c.lower() in sets:
                val = sets[c.lower()]
                expr = (
                    f"CASE WHEN ({pred}) THEN ({val}) ELSE `{bt}` END"
                    if pred
                    else f"({val})"
                )
                proj.append(
                    f"CAST({expr} AS {_col_type(spark, name, c)}) AS `{bt}`"
                )
            else:
                proj.append(f"`{bt}`")
        n = (
            run_sql(spark, f"SELECT count(*) FROM {name} WHERE {pred}", **kw)
            .collect()[0][0]
            if pred
            else spark.table(name).count()
        )
        ret = m.group("ret")
        ret_rows = None
        if ret:
            # RETURNING evaluates over the NEW values of matched rows:
            # compute the match flag alongside the rebuild, filter, then
            # project the user's expressions
            flag = (
                f"coalesce(CAST(({pred}) AS BOOLEAN), false)"
                if pred
                else "true"
            )
            full = run_sql(
                spark,
                f"SELECT {', '.join(proj)}, {flag} AS __upd FROM {name}",
                **kw,
            ).persist()
            full.count()
            view = f"__upd_ret_{name}"
            full.filter("__upd").drop("__upd").createOrReplaceTempView(view)
            ret_rows = run_sql(spark, f"SELECT {ret} FROM {view}", **kw)
            ret_rows = local_df(
                spark, ret_rows.collect(), ret_rows.schema
            )
            _swap_table(spark, name, full.drop("__upd"))
            full.unpersist()
            return ret_rows
        df = run_sql(spark, f"SELECT {', '.join(proj)} FROM {name}", **kw)
        _swap_table(spark, name, df)
        return _count_df(spark, n)

    m = _DELETE.match(sql)
    if m is not None:
        name, pred = m.group("name"), m.group("pred")
        if not spark.catalog.tableExists(name):
            raise ValueError(f'Table with name "{name}" does not exist')
        if pred is None:
            n = spark.table(name).count()
            df = run_sql(spark, f"SELECT * FROM {name} WHERE false", **kw)
        else:
            n = (
                run_sql(
                    spark, f"SELECT count(*) FROM {name} WHERE {pred}", **kw
                ).collect()[0][0]
            )
            df = run_sql(
                spark,
                f"SELECT * FROM {name} "
                f"WHERE NOT coalesce(CAST(({pred}) AS BOOLEAN), false)",
                **kw,
            )
        ret = m.group("ret")
        ret_rows = None
        if ret:
            # RETURNING projects the DELETED rows — materialize before
            # the swap rebinds the view
            cond = (
                f"coalesce(CAST(({pred}) AS BOOLEAN), false)"
                if pred
                else "true"
            )
            gone = run_sql(
                spark, f"SELECT {ret} FROM {name} WHERE {cond}", **kw
            )
            ret_rows = local_df(spark, gone.collect(), gone.schema)
        _swap_table(spark, name, df)
        return ret_rows if ret else _count_df(spark, n)

    m = _TRUNCATE.match(sql)
    if m is not None:
        name = m.group("name")
        if not spark.catalog.tableExists(name):
            raise ValueError(f'Table with name "{name}" does not exist')
        df = run_sql(spark, f"SELECT * FROM {name} WHERE false", **kw)
        _swap_table(spark, name, df)
        return local_df(spark, [], _SUCCESS_SCHEMA)

    if _COPY.match(sql):
        return _run_copy(spark, sql, run_sql, **kw)
    return None


def _col_type(spark: SparkSession, name: str, col: str) -> str:
    """Spark DDL type string of ``name.col`` — UPDATE keeps the column's
    declared type (DuckDB casts the assigned value to it)."""
    for f in spark.table(name).schema.fields:
        if f.name == col:
            return f.dataType.simpleString()
    raise ValueError(f"no column {col!r} in {name}")


def _swap_table(spark: SparkSession, name: str, df: DataFrame) -> int:
    """Materialize ``df`` atomically as session table ``name`` (persist +
    eager count first — a failing rebuild surfaces before the swap),
    mirroring the CTAS/INSERT discipline."""
    df = df.persist()
    n = df.count()
    key = (id(spark), name.lower())
    old = _session_tables.get(key)
    df.createOrReplaceTempView(name)
    _session_tables[key] = df
    if old is not None:
        old.unpersist()
    return n


_COPY_PARTS = re.compile(
    r"^\s*COPY\s+(?P<src>.+?)\s+TO\s+'(?P<path>[^']+)'\s*"
    r"(?:\(|WITH\s*\()?(?P<opts>[^()]*)\)?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _copy_format(path: str, opts: str) -> tuple[str, dict]:
    """DuckDB COPY options → (exporter name, exporter kwargs)."""
    o = opts.upper()
    kwargs: dict = {}
    pm = re.search(r"\bPARTITION_BY\s*(?:\(([^)]*)\)|(\w+))", opts, re.IGNORECASE)
    if pm:
        cols = pm.group(1) if pm.group(1) is not None else pm.group(2)
        kwargs["partition_by"] = [
            c.strip().strip('"') for c in cols.split(",") if c.strip()
        ]
    if re.search(r"\bFORMAT\s+PARQUET\b", o):
        return "parquet", kwargs
    if re.search(r"\bFORMAT\s+GDAL\b", o) or path.lower().endswith(".xlsx"):
        return "excel", kwargs
    if re.search(r"\bFORMAT\s+JSON\b", o) or path.lower().endswith((".json", ".ndjson", ".jsonl")):
        if re.search(r"\bARRAY\s+(TRUE|1)\b", o):
            return "json", kwargs
        return "ndjson", kwargs
    if path.lower().endswith(".parquet") and not o.strip():
        return "parquet", kwargs
    m = re.search(r"\bDELIMITER\s+'([^']*)'", opts, re.IGNORECASE)
    if m:
        kwargs["delimiter"] = m.group(1)
    if re.search(r"\bHEADER\s+(FALSE|0)\b", o):
        kwargs["header"] = False
    return "csv", kwargs


def _run_copy(
    spark: SparkSession, sql: str, run_sql, **kw
) -> DataFrame:
    from vscode_parquet_visualizer_spark.operators.export import export

    # parenthesized source = a full query; handle the balanced span
    # directly so query-internal parens/literals can't confuse the split
    m_head = re.match(r"^\s*COPY\s+", sql, re.IGNORECASE)
    rest = sql[m_head.end():]
    if rest.lstrip().startswith("("):
        from vscode_parquet_visualizer_spark.plans.dialect import (
            _balanced_span,
        )

        start = len(rest) - len(rest.lstrip())
        end = _balanced_span(rest, start)
        if end == -1:
            raise ValueError("COPY: unbalanced parentheses in source query")
        src_sql = rest[start + 1 : end]
        tail = rest[end + 1 :]
    else:
        m_src = re.match(r"^\s*([A-Za-z_]\w*)", rest)
        if m_src is None:
            raise ValueError(f"COPY: cannot parse source in {sql!r}")
        src_sql = f"SELECT * FROM {m_src.group(1)}"
        tail = rest[m_src.end():]
    m_from = re.match(
        r"\s*FROM\s+(?P<src>'[^']+'|[A-Za-z_]\w*)\s*"
        r"(?:\(|WITH\s*\()?(?P<opts>(?:[^()]|\([^()]*\))*)\)?\s*$",
        tail,
        re.IGNORECASE | re.DOTALL,
    )
    if m_from is not None:
        # COPY <table> FROM 'path' — append the file's rows into the
        # session table (positional alignment, same path as INSERT).
        # The gateway's file-relation routing may already have turned
        # the quoted path into a registry-backed view name.
        name = src_sql.split()[-1]  # src_sql is "SELECT * FROM <name>"
        if not spark.catalog.tableExists(name):
            raise ValueError(f'Table with name "{name}" does not exist')
        return try_rewrite_ddl(
            spark,
            f"INSERT INTO {name} SELECT * FROM {m_from.group('src')}",
            run_sql,
            **kw,
        )
    m_to = re.match(
        r"\s*TO\s+'(?P<path>[^']+)'\s*(?:\(|WITH\s*\()?"
        r"(?P<opts>(?:[^()]|\([^()]*\))*)\)?\s*$",
        tail,
        re.IGNORECASE | re.DOTALL,
    )
    if m_to is None:
        raise ValueError(
            f"COPY: expected TO/FROM '<path>' [(options)] in {sql!r}"
        )
    path, opts = m_to.group("path"), m_to.group("opts") or ""
    df = run_sql(spark, src_sql, **kw)
    fmt, kwargs = _copy_format(path, opts)
    n = df.count()
    export(df, path, fmt, **kwargs)
    return _count_df(spark, n)

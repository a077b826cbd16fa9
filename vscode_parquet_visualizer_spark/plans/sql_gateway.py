"""One SQL entry point for DuckDB-dialect text on Spark.

The reference passes the query tab's text verbatim to DuckDB
(src/duckdb-backend.ts:142-146); this module is the Spark-side
equivalent: route the statements that need an operator (ASOF JOIN,
POSITIONAL JOIN, dynamic PIVOT) and transpile everything else through
plans/dialect.py. ``Engine.sql`` and ``Dataset.query`` call this so
every surface goes through the same path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from vscode_parquet_visualizer_spark.plans import dialect
from vscode_parquet_visualizer_spark.plans.asof_sql import (
    try_rewrite_asof,
    try_rewrite_positional,
)
from vscode_parquet_visualizer_spark.plans.pivot_sql import (
    try_rewrite_pivot,
    try_rewrite_unpivot,
)

_ROUTED_JOIN = re.compile(
    r"\b(ASOF\s+(LEFT\s+)?|POSITIONAL\s+)JOIN\b", re.IGNORECASE
)

# DESCRIBE / SUMMARIZE statement heads (DuckDB introspection surfaces).
# ``DESCRIBE [TABLE] <target>`` / ``SUMMARIZE <target>`` where target is a
# relation name or a full query.
_INTROSPECT = re.compile(
    r"^\s*(DESCRIBE|SUMMARIZE)\s+(?:TABLE\s+)?(.+)$",
    re.IGNORECASE | re.DOTALL,
)

_QUERY_HEAD = re.compile(r"^\s*(SELECT|FROM|WITH|VALUES)\b", re.IGNORECASE)

# DuckDB ``UNION [ALL] BY NAME`` — Spark SQL has no BY NAME set-op
# syntax, but the DataFrame API has exactly its semantics
# (unionByName(allowMissingColumns=True): match columns by name, append
# the right side's new columns, NULL-fill the gaps).
_UNION_BY_NAME = re.compile(r"\bUNION\s+(ALL\s+)?BY\s+NAME\b", re.IGNORECASE)

_UBN_TAIL = re.compile(r"\b(ORDER\s+BY|LIMIT|OFFSET)\b", re.IGNORECASE)

_ubn_counter = 0

# DuckDB bare-path relations: ``FROM 'file.parquet'`` — route through the
# sources registry (so CSV header sniffing and the Avro fallback reader
# apply, same as opening the file), not Spark's format.`path` direct
# query (which reads CSV headerless). Only quoted strings with a known
# data-file extension are treated as relations.
_FILE_REL = re.compile(
    r"\b(FROM|JOIN)\s+'([^']+\.[A-Za-z0-9]+)'", re.IGNORECASE
)


_READ_FN_CALL = re.compile(
    r"\b(read_(?:parquet|csv|csv_auto|json|json_auto|avro|orc)"
    r"|parquet_scan)\s*\(\s*'([^']*)'\s*(?:,\s*([^()]*))?\)",
    re.IGNORECASE,
)

# DuckDB read_csv named args → Spark DataFrameReader options
_CSV_OPT_MAP = {
    "header": "header",
    "delim": "sep",
    "sep": "sep",
    "quote": "quote",
    "nullstr": "nullValue",
}


def _route_read_functions(
    spark: SparkSession, sql: str, dataset_path: str | None
) -> str:
    """User-typed ``read_csv('p' [, header=…, delim=…])`` etc →
    registry-backed temp views. The registry applies DuckDB-parity
    inference (CSV header + delimiter sniffing, Avro fallback codec) —
    the bare ``csv.`path``` form Spark would otherwise use reads
    headerless, a silent divergence. Named args (CSV subset: header,
    delim/sep, quote, nullstr) override the sniffer; unknown args leave
    the call unrouted to fail loudly. The ``'path'`` placeholder and
    the dataset's own path stay untouched for rewrite_from_data's view
    binding."""
    import hashlib

    from vscode_parquet_visualizer_spark.plans.dialect import (
        _READ_FN_FORMATS,
    )
    from vscode_parquet_visualizer_spark.sources import registry

    from vscode_parquet_visualizer_spark.plans.dialect import (
        _split_top_level,
    )

    def sub(m: re.Match) -> str:
        fn, path, rawopts = m.group(1).lower(), m.group(2), m.group(3)
        if path == "path" or (dataset_path and path == dataset_path):
            return m.group(0)
        fmt = _READ_FN_FORMATS.get(fn, "parquet")
        opts: dict[str, str] = {}
        names: list[str] | None = None
        columns: list[tuple[str, str]] | None = None
        filename = False
        header_false = False
        if rawopts and rawopts.strip():
            if fmt not in ("csv", "json"):
                return m.group(0)  # options only supported for CSV/JSON
            for pair in _split_top_level(rawopts):
                k, eq, v = pair.partition("=")
                if not eq:
                    k, eq, v = pair.partition(":=")  # named-arg spelling
                k, v = k.strip().lower(), v.strip()
                if not eq:
                    return m.group(0)
                if k == "names":
                    lm = re.fullmatch(r"\[(.*)\]", v, re.DOTALL)
                    if lm is None:
                        return m.group(0)
                    names = [
                        c.strip().strip("'\"")
                        for c in lm.group(1).split(",")
                        if c.strip()
                    ]
                elif k == "columns":
                    sm = re.fullmatch(r"\{(.*)\}", v, re.DOTALL)
                    if sm is None:
                        return m.group(0)
                    columns = []
                    for item in _split_top_level(sm.group(1)):
                        ck, sep, cv = item.partition(":")
                        if not sep:
                            return m.group(0)
                        columns.append(
                            (ck.strip().strip("'\""), cv.strip().strip("'\""))
                        )
                elif k == "filename":
                    filename = v.strip("'\"").lower() in ("true", "1")
                elif k == "format" and fmt == "json":
                    # newline_delimited / array / auto — the registry's
                    # json reader sniffs both shapes; accept and drop
                    continue
                elif fmt == "csv" and k in _CSV_OPT_MAP:
                    opts[_CSV_OPT_MAP[k]] = v.strip("'\"")
                else:
                    return m.group(0)  # unknown arg: loud
        if columns is not None:
            # explicit schema disables inference: read headerless
            # strings, cast per column (DuckDB type spellings — the
            # downstream transpile maps them)
            opts.setdefault("header", opts.get("header", "false"))
        header_false = opts.get("header", "").lower() == "false"
        view = "__read_" + hashlib.md5(
            (path + repr(sorted(opts.items()))).encode()
        ).hexdigest()[:12]
        if opts:
            # Route through the registry so an explicit delim= still
            # gets the independent header sniff (hardcoding header=True
            # here silently ate the first data row of headerless files)
            df = registry.read(spark, path, fmt, **opts)
        else:
            df = registry.read(spark, path, fmt)
        if header_false:
            # DuckDB names inferred headerless columns column0, column1…
            df = df.toDF(*[f"column{i}" for i in range(len(df.columns))])
        if names is not None:
            cols = df.columns
            if len(names) > len(cols):
                raise ValueError(
                    f"{fn}: {len(names)} names for {len(cols)} columns"
                )
            df = df.toDF(*(names + cols[len(names) :]))
        df.createOrReplaceTempView(view)
        if columns is not None:
            if len(columns) != len(df.columns):
                raise ValueError(
                    f"{fn}: columns= lists {len(columns)} entries for "
                    f"{len(df.columns)} columns"
                )
            casts = ", ".join(
                f"CAST({old} AS {typ}) AS {new}"
                for old, (new, typ) in zip(df.columns, columns)
            )
            return f"(SELECT {casts} FROM {view})"
        if filename:
            # DuckDB's filename column is the path as given; a literal
            # single path stays literal, globs fall back to the
            # scheme-stripped per-row source file
            fcol = (
                f"'{path}' AS filename"
                if not re.search(r"[*?\[\]]", path)
                else "regexp_replace(input_file_name(), '^file:(//)?', '')"
                " AS filename"
            )
            return f"(SELECT *, {fcol} FROM {view})"
        return view

    return _READ_FN_CALL.sub(sub, sql)


_FILE_FN_CALL = re.compile(
    r"\b(glob|read_blob|read_text)\s*\(\s*'([^']*)'\s*\)", re.IGNORECASE
)


def _route_file_functions(spark: SparkSession, sql: str) -> str:
    """DuckDB's file-listing table functions (wave 47):

    - ``glob('pat')`` → one ``file`` row per match. Globbing is a
      driver-side metadata operation on every engine; local patterns
      use Python's glob (absolute paths come back as given, matching
      DuckDB's local filesystem behavior).
    - ``read_blob('pat')`` / ``read_text('pat')`` → (filename,
      content, size, last_modified) via Spark's binaryFile source
      (glob-capable, distributed, content column prunable); read_text
      decodes UTF-8. Divergence: paths render absolute (binaryFile
      URIs, scheme-stripped) where DuckDB echoes a relative pattern
      relatively.
    """
    import hashlib

    def sub(m: re.Match) -> str:
        fn, pattern = m.group(1).lower(), m.group(2)
        view = "__file_" + hashlib.md5(
            (fn + ":" + pattern).encode()
        ).hexdigest()[:12]
        if fn == "glob":
            import glob as _glob

            files = sorted(_glob.glob(pattern))
            df = spark.createDataFrame(
                [(f,) for f in files], "file string"
            )
            df.createOrReplaceTempView(view)
            return view
        df = spark.read.format("binaryFile").load(pattern)
        df.createOrReplaceTempView(view)
        content = "content" if fn == "read_blob" else "decode(content, 'UTF-8')"
        return (
            f"(SELECT regexp_replace(path, '^file:(//)?', '') AS filename, "
            f"{content} AS content, length AS size, "
            f"modificationTime AS last_modified FROM {view})"
        )

    return _FILE_FN_CALL.sub(sub, sql)


def _route_file_relations(spark: SparkSession, sql: str) -> str:
    import hashlib

    from vscode_parquet_visualizer_spark.sources import registry

    def sub(m: re.Match) -> str:
        path = m.group(2)
        ext = path.rsplit(".", 1)[-1].lower()
        if ext not in registry.EXTENSION_FORMATS:
            return m.group(0)
        view = "__file_" + hashlib.md5(path.encode()).hexdigest()[:12]
        registry.read(spark, path).createOrReplaceTempView(view)
        return f"{m.group(1)} {view}"

    return _FILE_REL.sub(sub, sql)


def _split_statements(sql: str) -> list[str]:
    """Split a script on top-level ``;`` (string literals and parens
    respected); drop empty trailing statements."""
    from vscode_parquet_visualizer_spark.plans.dialect import (
        _depth_at,
        _protect_literals,
        _restore_literals,
    )

    if ";" not in sql:
        return [sql]
    prot, stash = _protect_literals(sql)
    parts, last = [], 0
    for i, ch in enumerate(prot):
        if ch == ";" and _depth_at(prot, i) == 0:
            parts.append(prot[last:i])
            last = i + 1
    parts.append(prot[last:])
    stmts = [
        _restore_literals(p, stash, form="duck").strip() for p in parts
    ]
    return [s for s in stmts if s]


def _strip_outer_parens(seg: str) -> str:
    from vscode_parquet_visualizer_spark.plans.dialect import _balanced_span

    s = seg.strip()
    while s.startswith("(") and _balanced_span(s, 0) == len(s) - 1:
        s = s[1:-1].strip()
    return s


def _try_union_by_name(
    spark: SparkSession, bound: str, **kw
) -> DataFrame | None:
    """Route ``q1 UNION [ALL] BY NAME q2 [… ] [ORDER BY …] [LIMIT …]``:
    each side runs recursively through run_sql (so FROM-first, dialect
    rewrites, even nested routed joins work per side), the sides combine
    left-associatively with unionByName — deduplicating after each
    non-ALL step, DuckDB's set-op semantics — and a trailing top-level
    ORDER BY/LIMIT/OFFSET binds to the union result."""
    from vscode_parquet_visualizer_spark.plans.dialect import (
        _depth_at,
        _protect_literals,
        _restore_literals,
    )

    if not _UNION_BY_NAME.search(bound):
        return None
    prot, stash = _protect_literals(bound)
    seps = [
        m
        for m in _UNION_BY_NAME.finditer(prot)
        if _depth_at(prot, m.start()) == 0
    ]
    if not seps:
        return None  # only inside literals/subqueries — leave untouched
    segments: list[str] = []
    keep_dups: list[bool] = []
    last = 0
    for m in seps:
        segments.append(prot[last : m.start()])
        keep_dups.append(bool(m.group(1)))
        last = m.end()
    segments.append(prot[last:])
    # a trailing top-level ORDER BY/LIMIT/OFFSET belongs to the union
    tail = ""
    for m in _UBN_TAIL.finditer(segments[-1]):
        if _depth_at(segments[-1], m.start()) == 0:
            tail = segments[-1][m.start() :]
            segments[-1] = segments[-1][: m.start()]
            break
    sides = [
        run_sql(
            spark,
            _strip_outer_parens(_restore_literals(seg, stash, form="duck")),
            **kw,
        )
        for seg in segments
    ]
    out = sides[0]
    for df, keep in zip(sides[1:], keep_dups):
        out = out.unionByName(df, allowMissingColumns=True)
        if not keep:
            out = out.dropDuplicates()
    if tail.strip():
        global _ubn_counter
        _ubn_counter += 1
        view = f"__union_by_name_{_ubn_counter}"
        out.createOrReplaceTempView(view)
        return run_sql(
            spark, f"SELECT * FROM {view} "
            f'{_restore_literals(tail, stash, form="duck")}'
        )
    return out

_PARQUET_SCHEMA_FN = re.compile(
    r"\bparquet_schema\s*\(\s*'([^']*)'\s*\)", re.IGNORECASE
)

_PS_SCHEMA = (
    "file_name string, name string, type string, type_length string, "
    "repetition_type string, num_children int, converted_type string, "
    "scale int, precision int, field_id int, logical_type string"
)

_ps_counter = 0


def _route_parquet_schema(spark: SparkSession, sql: str) -> str:
    """``FROM parquet_schema('path')`` → footer rows as a temp view
    (functions/metadata.parquet_schema_rows — driver-side O(footer),
    the same engine-table-function pattern as parquet_file_metadata)."""
    from pyspark.sql import Row

    from vscode_parquet_visualizer_spark.functions.metadata import (
        parquet_schema_rows,
    )

    def sub(m: re.Match) -> str:
        global _ps_counter
        rows = parquet_schema_rows(m.group(1))
        _ps_counter += 1
        view = f"__parquet_schema_{_ps_counter}"
        spark.createDataFrame(
            [Row(**r) for r in rows], schema=_PS_SCHEMA
        ).coalesce(1).createOrReplaceTempView(view)
        return view

    return _PARQUET_SCHEMA_FN.sub(sub, sql)


_PRAGMA_TABLE_INFO_FN = re.compile(
    r"\bpragma_table_info\s*\(\s*'?([A-Za-z_]\w*)'?\s*\)", re.IGNORECASE
)

_CURRENT_SETTING_FN = re.compile(
    r"\bcurrent_setting\s*\(\s*'([^']*)'\s*\)", re.IGNORECASE
)


def _route_current_setting(spark: SparkSession, sql: str) -> str:
    """``current_setting('name')`` with a literal name — resolved at
    bind time against recorded SET values + live session conf
    (plans/ddl_sql.current_setting); unknown names raise like DuckDB."""
    from vscode_parquet_visualizer_spark.plans.ddl_sql import current_setting

    def sub(m: re.Match) -> str:
        v = current_setting(spark, m.group(1))
        return "'" + v.replace("'", "''") + "'"

    return _CURRENT_SETTING_FN.sub(sub, sql)


_pti_counter = 0


def _route_pragma_table_info(spark: SparkSession, sql: str) -> str:
    """``FROM pragma_table_info('t')`` — the table-function form of
    ``PRAGMA table_info`` (same rows), usable inside a full SELECT."""
    from vscode_parquet_visualizer_spark.plans.ddl_sql import table_info_df

    def sub(m: re.Match) -> str:
        global _pti_counter
        _pti_counter += 1
        view = f"__pragma_table_info_{_pti_counter}"
        table_info_df(spark, m.group(1)).createOrReplaceTempView(view)
        return view

    return _PRAGMA_TABLE_INFO_FN.sub(sub, sql)


_PARQUET_META_FN = re.compile(
    r"\bparquet_file_metadata\s*\(\s*'([^']*)'\s*\)", re.IGNORECASE
)

_PM_SCHEMA = (
    "file_name string, created_by string, num_rows long, "
    "num_row_groups long, format_version string, "
    "encryption_algorithm string, footer_signing_key_metadata string"
)

_READ_LIST_FN = re.compile(
    r"\b(read_parquet|parquet_scan)\s*\(\s*\[([^\]]*)\]\s*\)", re.IGNORECASE
)

_pm_counter = 0


def _route_parquet_metadata(spark: SparkSession, sql: str) -> str:
    """``FROM parquet_file_metadata('path')`` → the A11 footer record as
    a temp view (reference: src/duckdb-backend.ts:128-140 — the 7
    displayed fields; driver-side O(footer))."""
    from pyspark.sql import Row

    from vscode_parquet_visualizer_spark.functions.metadata import (
        parquet_file_metadata,
    )

    def sub(m: re.Match) -> str:
        global _pm_counter
        rows = parquet_file_metadata(m.group(1))
        _pm_counter += 1
        view = f"__parquet_meta_{_pm_counter}"
        spark.createDataFrame(
            [Row(**r) for r in rows], schema=_PM_SCHEMA
        ).coalesce(1).createOrReplaceTempView(view)
        return view

    return _PARQUET_META_FN.sub(sub, sql)


_INFO_SCHEMA_COLS = re.compile(
    r"\binformation_schema\s*\.\s*columns\b", re.IGNORECASE
)

_IS_SCHEMA = (
    "table_catalog string, table_schema string, table_name string, "
    "column_name string, ordinal_position int, column_default string, "
    "is_nullable string, data_type string"
)


def _route_information_schema(spark: SparkSession, sql: str) -> str:
    """User-typed ``information_schema.columns`` — the reference drives
    its Excel type filter from this catalog view (src/worker.ts:331-336).
    The engine's datasets and materialized results live as temp views
    (mirroring the reference's in-memory DuckDB catalog), so enumerate
    them driver-side — O(#columns), no job — with DuckDB type spellings
    and the ANSI column set the reference selects from."""
    from pyspark.sql import Row

    from vscode_parquet_visualizer_spark.functions.schema_format import (
        duckdb_type_string,
    )

    rows = []
    for tbl in spark.catalog.listTables():
        name = tbl.name
        if name.startswith("__"):  # gateway-internal helper views
            continue
        try:
            schema = spark.table(name).schema
        except Exception:  # view over a dropped dependency etc.
            continue
        for i, f in enumerate(schema.fields, start=1):
            rows.append(
                Row(
                    table_catalog="memory",
                    table_schema="main",
                    table_name=name,
                    column_name=f.name,
                    ordinal_position=i,
                    column_default=None,
                    is_nullable="YES" if f.nullable else "NO",
                    data_type=duckdb_type_string(f.dataType),
                )
            )
    view = "__information_schema_columns"
    spark.createDataFrame(rows, schema=_IS_SCHEMA).coalesce(
        1
    ).createOrReplaceTempView(view)
    return _INFO_SCHEMA_COLS.sub(view, sql)


def _route_read_lists(spark: SparkSession, sql: str) -> str:
    """``read_parquet(['a.parquet', 'b.parquet'])`` — the multi-file
    list form — → one temp view over a multi-path read (each path keeps
    its own splits; the union is lazy, not a copy)."""

    def sub(m: re.Match) -> str:
        global _pm_counter
        paths = [
            p.strip().strip("'") for p in m.group(2).split(",") if p.strip()
        ]
        _pm_counter += 1
        view = f"__read_list_{_pm_counter}"
        spark.read.parquet(*paths).createOrReplaceTempView(view)
        return view

    return _READ_LIST_FN.sub(sub, sql)


def run_sql(
    spark: SparkSession,
    sql: str,
    view: str = "data",
    columns: list[str] | None = None,
    dataset_path: str | None = None,
    array_columns: set[str] | None = None,
    date_columns: set[str] | None = None,
    integral_columns: set[str] | None = None,
) -> DataFrame:
    """Execute DuckDB-dialect ``sql`` and return the result DataFrame.

    ``view``/``dataset_path`` bind the ``data`` placeholder relation
    first (so routed statements see the caller's dataset), then:
    ASOF/POSITIONAL JOIN → operator-backed rewrite (plans/asof_sql.py),
    full-statement dynamic ``PIVOT`` → lowered grouped aggregation
    (plans/pivot_sql.py), everything else → dialect.transpile →
    ``spark.sql``."""
    stmts = _split_statements(sql)
    if len(stmts) > 1:
        # multi-statement script: run each in order, return the last
        # result (DuckDB's script semantics — earlier statements are
        # usually session DDL feeding the final SELECT)
        out: DataFrame | None = None
        for stmt in stmts:
            out = run_sql(
                spark,
                stmt,
                view=view,
                columns=columns,
                dataset_path=dataset_path,
                array_columns=array_columns,
                date_columns=date_columns,
            )
        assert out is not None
        return out
    stripped = sql.rstrip().rstrip(";")
    if _READ_FN_CALL.search(stripped):
        stripped = _route_read_functions(spark, stripped, dataset_path)
    if _FILE_FN_CALL.search(stripped):
        stripped = _route_file_functions(spark, stripped)
    bound = dialect.rewrite_from_data(
        stripped, view=view, dataset_path=dataset_path
    )
    from vscode_parquet_visualizer_spark.plans.ddl_sql import (
        _CREATE_MACRO,
        expand_macros,
        substitute_enums,
        substitute_sequences,
    )

    if not _CREATE_MACRO.match(bound):
        # a macro DEFINITION keeps nextval()/enum casts as text — DuckDB
        # evaluates the body per invocation, so substituting here would
        # freeze nextval('s') to one definition-time value (ADVICE r10);
        # expand_macros runs first, so call-time expansion flows through
        # these substitutions on every invocation.
        bound = expand_macros(spark, bound)
        bound = substitute_sequences(spark, bound)
        from vscode_parquet_visualizer_spark.plans.ddl_sql import (
            try_rewrite_enum_setop_order,
        )

        es = try_rewrite_enum_setop_order(
            spark,
            bound,
            run_sql,
            view=view,
            columns=columns,
            dataset_path=dataset_path,
            array_columns=array_columns,
            date_columns=date_columns,
        )
        if es is not None:
            return es
        bound = substitute_enums(spark, bound)
    if _FILE_REL.search(bound):
        bound = _route_file_relations(spark, bound)
    intro = _INTROSPECT.match(bound)
    if intro is not None:
        from vscode_parquet_visualizer_spark.functions.summarize import (
            describe_df,
            summarize_df,
        )

        target = intro.group(2).strip()
        rel = run_sql(
            spark,
            target if _QUERY_HEAD.match(target) else f"SELECT * FROM {target}",
            view=view,
            columns=columns,
            dataset_path=dataset_path,
            array_columns=array_columns,
            date_columns=date_columns,
        )
        fn = (
            describe_df
            if intro.group(1).upper() == "DESCRIBE"
            else summarize_df
        )
        return fn(spark, rel)
    from vscode_parquet_visualizer_spark.plans.ddl_sql import try_rewrite_ddl

    ddl = try_rewrite_ddl(
        spark,
        bound,
        run_sql,
        view=view,
        columns=columns,
        dataset_path=dataset_path,
        array_columns=array_columns,
        date_columns=date_columns,
    )
    if ddl is not None:
        return ddl
    ubn = _try_union_by_name(
        spark,
        bound,
        view=view,
        columns=columns,
        dataset_path=dataset_path,
        array_columns=array_columns,
        date_columns=date_columns,
    )
    if ubn is not None:
        return ubn
    if _PARQUET_SCHEMA_FN.search(bound):
        bound = _route_parquet_schema(spark, bound)
    if _PARQUET_META_FN.search(bound):
        bound = _route_parquet_metadata(spark, bound)
    if _READ_LIST_FN.search(bound):
        bound = _route_read_lists(spark, bound)
    if _INFO_SCHEMA_COLS.search(bound):
        bound = _route_information_schema(spark, bound)
    if _PRAGMA_TABLE_INFO_FN.search(bound):
        bound = _route_pragma_table_info(spark, bound)
    if _CURRENT_SETTING_FN.search(bound):
        bound = _route_current_setting(spark, bound)
    if _ROUTED_JOIN.search(bound):
        routed = try_rewrite_asof(spark, bound) or try_rewrite_positional(
            spark, bound
        )
        if routed is not None:
            bound = routed
    if re.search(r"\(\s*PIVOT\b", bound, re.IGNORECASE):
        from vscode_parquet_visualizer_spark.plans.pivot_sql import (
            route_embedded_pivots,
        )

        bound = route_embedded_pivots(spark, bound)
    if re.search(r"\bPIVOT\s*\(", bound, re.IGNORECASE):
        from vscode_parquet_visualizer_spark.plans.pivot_sql import (
            rewrite_standard_count_pivot,
        )

        bound = rewrite_standard_count_pivot(
            spark,
            bound,
            run_sql,
            view=view,
            columns=columns,
            dataset_path=dataset_path,
            array_columns=array_columns,
            date_columns=date_columns,
        )
    pivoted = try_rewrite_pivot(spark, bound)
    if pivoted is not None:
        return pivoted
    unpivoted = try_rewrite_unpivot(spark, bound)
    if unpivoted is not None:
        return unpivoted
    if re.search(r"\bOVER\b", bound, re.IGNORECASE):
        # rank-family window over a low-cardinality key above the size
        # gate: lower onto the distributed rank operator instead of
        # WindowExec's one-task-per-window-partition plan (plans/
        # rank_sql.py; reference passes this SQL verbatim to its engine,
        # src/worker.ts:516-541)
        from vscode_parquet_visualizer_spark.plans.rank_sql import (
            rewrite_fractional_lag_defaults,
            try_rewrite_rank,
        )

        # fractional lag/lead defaults: round before Spark's implicit
        # integral cast (DuckDB parity; r14 verdict item 3) — rewritten
        # here so the WindowExec AND lowered paths both see it
        bound = rewrite_fractional_lag_defaults(
            spark,
            bound,
            lambda s: spark.sql(
                dialect.transpile(
                    s,
                    view=view,
                    columns=columns,
                    dataset_path=dataset_path,
                    array_columns=array_columns,
                    date_columns=date_columns,
                    integral_columns=integral_columns,
                )
            ),
        )
        ranked = try_rewrite_rank(
            spark,
            bound,
            run_sql,
            view=view,
            columns=columns,
            dataset_path=dataset_path,
            array_columns=array_columns,
            date_columns=date_columns,
            integral_columns=integral_columns,
        )
        if ranked is not None:
            return ranked
    return spark.sql(
        dialect.transpile(
            bound,
            view=view,
            columns=columns,
            dataset_path=dataset_path,
            array_columns=array_columns,
            date_columns=date_columns,
            integral_columns=integral_columns,
        )
    )

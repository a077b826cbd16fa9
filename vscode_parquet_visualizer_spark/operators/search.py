"""Cross-column free-text search (SURVEY.md §2 A9).

Reference semantics (src/worker.ts:136-210, clause build :158-166): the
search string matches a row if ANY column matches ``LIKE '%term%'``;
VARCHAR columns match directly, every other column is CAST to TEXT first.
The filtered result is materialized to a second table
(``filtered_query_result``) so subsequent paging is cheap; an empty search
string resets to the unfiltered result.

Spark-first shape: one ``F.filter`` with an OR-reduction of
``col.cast("string").contains(term)`` — stays entirely in whole-stage
codegen (no UDF), pushes nothing (contains over every column can't prune),
but runs a single pass over the cached result partitions. ``contains`` is
literal substring match, which equals LIKE with ``%``/``_`` escaped — the
escaping the reference forgets to do (its raw interpolation makes ``%`` a
wildcard); we implement literal semantics and expose ``like_pattern=True``
for reference-exact behavior.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vscode_parquet_visualizer_spark.operators.pagination import ROW_ID


def search_condition(
    df: DataFrame, term: str, like_pattern: bool = False
) -> Column:
    """OR-of-substring over every (non-internal) column."""
    cols = [c for c in df.columns if c != ROW_ID]
    if like_pattern:
        # Reference-exact: raw LIKE '%term%' (user % and _ act as wildcards).
        clauses = [F.col(f"`{c}`").cast("string").like(f"%{term}%") for c in cols]
    else:
        clauses = [F.col(f"`{c}`").cast("string").contains(term) for c in cols]
    return reduce(lambda a, b: a | b, clauses)


def search(df: DataFrame, term: str, like_pattern: bool = False) -> DataFrame:
    """Filter rows where any column contains ``term`` (empty term = no-op)."""
    if term == "":
        return df
    return df.filter(search_condition(df, term, like_pattern=like_pattern))

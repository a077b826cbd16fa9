"""Deterministic LIMIT/OFFSET pagination over a DataFrame.

Reference semantics (src/duckdb-paginator.ts:29-60, src/paginator.ts:27-79):
``SELECT * FROM <src> [ORDER BY ...] LIMIT pageSize OFFSET (page-1)*size``;
page size "all" omits the LIMIT; navigation ops are first/prev/next/last/goto
with clamping at both ends.

The one semantic trap in Spark (SURVEY.md §7 "hard parts" #1): DuckDB tables
have a stable scan order, Spark DataFrames do not — row order can differ
between jobs. Pages must therefore be anchored to a total order. The engine
attaches a ``__row_id`` column at materialization time (partition-ordered,
stable for a cached/deterministic plan) and every page query sorts by the
user sort (if any) *then* ``__row_id`` as tiebreaker, making page boundaries
deterministic even under duplicate sort keys.

At scale: ``offset().limit()`` over a cached result is a narrow job — no
shuffle; Catalyst plans ``GlobalLimit(offset+limit)`` over the cached
partitions, so early pages touch few partitions. Deep offsets degrade
linearly (as they do in every engine, including the reference's
LIMIT/OFFSET SQL).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame

ROW_ID = "__row_id"
PAGE_ALL = -1  # reference's "all" page size


def page_count(total_rows: int, page_size: int) -> int:
    """Mirror of the reference's getPageCount (src/util.ts:77-85)."""
    if page_size == PAGE_ALL:
        return 1
    if page_size <= 0:
        raise ValueError(f"invalid page size {page_size}")
    return max(1, math.ceil(total_rows / page_size))


@dataclass
class Paginator:
    """Stateful page navigation mirroring src/paginator.ts:31-79.

    Holds (df, total_rows, page_size, page_number); the df must already
    carry a total order (engine sorts by user-sort + __row_id before
    handing it over).
    """

    df: DataFrame
    total_rows: int
    page_size: int
    page_number: int = 1

    @property
    def total_pages(self) -> int:
        return page_count(self.total_rows, self.page_size)

    def _slice(self) -> DataFrame:
        if self.page_size == PAGE_ALL:
            return self.df
        offset = (self.page_number - 1) * self.page_size
        sliced = self.df.offset(offset) if offset else self.df
        return sliced.limit(self.page_size)

    def goto(self, page_number: int) -> DataFrame:
        # Reference raises on page < 1 or page > pageCount
        # (src/paginator.ts:66-79); we clamp-or-raise identically.
        if page_number < 1 or page_number > self.total_pages:
            raise IndexError(
                f"page {page_number} out of range 1..{self.total_pages}"
            )
        self.page_number = page_number
        return self._slice()

    def first(self) -> DataFrame:
        return self.goto(1)

    def last(self) -> DataFrame:
        return self.goto(self.total_pages)

    def next(self) -> DataFrame:
        return self.goto(min(self.page_number + 1, self.total_pages))

    def previous(self) -> DataFrame:
        return self.goto(max(self.page_number - 1, 1))

"""Pagination math + navigation semantics (reference src/paginator.ts:31-79,
src/util.ts:77-85)."""

import pytest

from vscode_parquet_visualizer_spark.operators.pagination import (
    PAGE_ALL,
    Paginator,
    page_count,
)


def test_page_count_math():
    assert page_count(0, 20) == 1
    assert page_count(1, 20) == 1
    assert page_count(20, 20) == 1
    assert page_count(21, 20) == 2
    assert page_count(1500, 500) == 3
    assert page_count(1500, PAGE_ALL) == 1


def test_page_count_invalid():
    with pytest.raises(ValueError):
        page_count(10, 0)


@pytest.fixture(scope="module")
def pager(spark):
    df = spark.range(95).orderBy("id")
    return Paginator(df, 95, 10)


def test_navigation(pager):
    assert [r.id for r in pager.first().collect()][:3] == [0, 1, 2]
    assert pager.total_pages == 10
    nxt = pager.next().collect()
    assert nxt[0].id == 10
    last = pager.last().collect()
    assert len(last) == 5 and last[0].id == 90
    prev = pager.previous().collect()
    assert prev[0].id == 80


def test_goto_bounds(pager):
    with pytest.raises(IndexError):
        pager.goto(0)
    with pytest.raises(IndexError):
        pager.goto(11)


def test_next_clamps_at_last(pager):
    pager.goto(10)
    rows = pager.next().collect()  # clamped to last page
    assert rows[0].id == 90


def test_page_all(spark):
    df = spark.range(30)
    p = Paginator(df, 30, PAGE_ALL)
    assert p.total_pages == 1
    assert len(p.first().collect()) == 30

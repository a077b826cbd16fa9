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
    """Render a timestamp per the settings (reference src/backend.ts:144-155).

    Naive datetimes are treated as UTC (the engine pins the session to
    UTC); ``utc=False`` converts to the machine's local zone like the
    reference's local mode."""
    s = settings or Settings()
    v = value
    if v.tzinfo is None:
        v = v.replace(tzinfo=dt.timezone.utc)
    v = v.astimezone(dt.timezone.utc if s.utc else None)
    v = v.replace(tzinfo=None)
    if s.datetime_format == ISO8601:
        return v.isoformat(sep=" ")
    if s.datetime_format == RFC2822:
        return v.strftime("%a, %d %b %Y %H:%M:%S") + (" +0000" if s.utc else "")
    return v.strftime(_to_strftime(s.datetime_format))


def format_date(value: dt.date) -> str:
    """Date32 values render date-only regardless of datetime settings
    (reference src/backend.ts:135-142)."""
    return value.isoformat()

"""Minimal single-sheet .xlsx writer on the stdlib (zipfile + XML).

The reference ships Excel export via DuckDB's excel extension
(``COPY ... TO ... WITH (FORMAT xlsx, HEADER true)``, src/worker.ts:327-424);
this container has no openpyxl/xlsxwriter, so we write the OOXML package
ourselves. An .xlsx file is a zip with four required parts:

    [Content_Types].xml      part-type manifest
    _rels/.rels              package → workbook relationship
    xl/workbook.xml          sheet list
    xl/_rels/workbook.xml.rels  workbook → worksheet relationship
    xl/worksheets/sheet1.xml the cell grid

Cells use inline strings (``t="inlineStr"``) so no sharedStrings table is
needed; numbers use ``t="n"``, booleans ``t="b"``. Dates/timestamps are
written as ISO-8601 inline strings — deterministic and locale-free (the
serial-number date encoding needs a styles part and an epoch choice for
no parity benefit). Nulls are omitted cells.

This is the interactive single-file export path: rows stream through the
driver one at a time (``toLocalIterator`` upstream), bounded by driver
memory exactly like the reference's single process.
"""

from __future__ import annotations

import datetime as dt
import zipfile
from typing import Any, Iterable
from xml.sax.saxutils import escape

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" '
    'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def column_letter(idx: int) -> str:
    """0-based column index → A1-style letters (0→A, 25→Z, 26→AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value: Any) -> str:
    """One <c> element, or '' for nulls (omitted cell)."""
    if value is None:
        return ""
    # bool before int: bool is an int subclass
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and value != value:  # NaN
            return ""
        return f'<c r="{ref}" t="n"><v>{value!r}</v></c>'
    if isinstance(value, (dt.datetime, dt.date, dt.time)):
        text = value.isoformat(sep=" ") if isinstance(value, dt.datetime) else value.isoformat()
    elif isinstance(value, (bytes, bytearray)):
        text = bytes(value).hex()
    else:
        text = str(value)
    return f'<c r="{ref}" t="inlineStr"><is><t>{escape(text)}</t></is></c>'


def write_xlsx(
    path: str, header: list[str], rows: Iterable[Iterable[Any]]
) -> int:
    """Write one sheet with a header row; returns data-row count.

    ``rows`` is consumed lazily — pass an iterator to keep driver memory
    bounded to one row at a time.
    """
    n = 0
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        with zf.open("xl/worksheets/sheet1.xml", "w") as sheet:
            def w(s: str) -> None:
                sheet.write(s.encode("utf-8"))

            w(
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main"><sheetData>'
            )
            w("<row r=\"1\">")
            for c, name in enumerate(header):
                w(_cell_xml(f"{column_letter(c)}1", str(name)))
            w("</row>")
            for r, row in enumerate(rows, start=2):
                n += 1
                w(f'<row r="{r}">')
                for c, value in enumerate(row):
                    cell = _cell_xml(f"{column_letter(c)}{r}", value)
                    if cell:
                        w(cell)
                w("</row>")
            w("</sheetData></worksheet>")
    return n

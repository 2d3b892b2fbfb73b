"""Minimal XLSX writer (public OOXML spec; pure python, no openpyxl).

Replaces the reference's openpyxl sink (/root/reference/main.py:250-321):
the 17-column attribute workbook with the header row.  Styling
(fills/borders/widths, main.py:252-281) is presentation, not semantics —
deliberately not reproduced (COVERAGE.md documents the deviation).

An .xlsx file is a ZIP of XML parts; cells are written as ``inlineStr``
so no shared-string table is needed.  Streamed row-by-row from an
iterator — the driver never holds the whole table.
"""

from __future__ import annotations

import math
import re
import zipfile
from typing import Iterable, Sequence
from xml.sax.saxutils import escape

# chars invalid in XML 1.0 even when escaped (everything C0 except \t\n\r)
_XML_INVALID = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")

# XLSX column headers A1:Q1 (main.py:283-299)
REFERENCE_HEADER = [
    "Кадастровый номер",
    "Кадастровый номер единого землепользования",
    "Площадь, м2",
    "Адрес",
    "Статус",
    "Категория земель",
    "Вид разрешенного использования (по документу)",
    "Правообладатель",
    "Вид права, номер и дата регистрации",
    "Ограничения прав и обременения",
    "Вид ограничения (обременения), номер и дата регистрации, срок действия",
    "Особые отметки",
    "Дата постановки на кад. учёт",
    "Дата получения сведений",
    "КН расположенных в пределах ЗУ или ОКС объектов недвижимости",
    "Кадастровая стоимость, руб.",
    "Вид объекта недвижимости",
]

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
 <Default Extension="xml" ContentType="application/xml"/>
 <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
 <Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _row_xml(row_idx: int, values: Sequence) -> str:
    cells = []
    for ci, v in enumerate(values):
        col = ""
        n = ci
        while True:
            col = chr(ord("A") + n % 26) + col
            n = n // 26 - 1
            if n < 0:
                break
        ref = f"{col}{row_idx}"
        # numeric <v> only for finite numbers: nan/inf are not valid XLSX
        # numeric cell values (Excel rejects the workbook), so they fall
        # through to the inlineStr branch (ADVICE r2)
        if (
            isinstance(v, (int, float))
            and not isinstance(v, bool)
            and not (isinstance(v, float) and not math.isfinite(v))
        ):
            cells.append(f'<c r="{ref}"><v>{v}</v></c>')
        else:
            text = escape(_XML_INVALID.sub("", "" if v is None else str(v)))
            cells.append(f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>')
    return f'<row r="{row_idx}">{"".join(cells)}</row>'


def write_xlsx(
    path: str,
    rows: Iterable[Sequence],
    header: Sequence[str] = REFERENCE_HEADER,
) -> int:
    """Write ``rows`` (iterable of value sequences) under ``header``;
    returns the data-row count."""
    n = 0
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        with z.open("xl/worksheets/sheet1.xml", "w") as f:
            f.write(
                b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                b'<worksheet xmlns="http://schemas.openxmlformats.org/'
                b'spreadsheetml/2006/main"><sheetData>'
            )
            f.write(_row_xml(1, list(header)).encode("utf-8"))
            for i, row in enumerate(rows, start=2):
                f.write(_row_xml(i, row).encode("utf-8"))
                n += 1
            f.write(b"</sheetData></worksheet>")
    return n


def read_xlsx_rows(path: str) -> list[list[str]]:
    """Round-trip reader (test/QA aid): inlineStr/number cells only."""
    import re
    import xml.etree.ElementTree as ET

    with zipfile.ZipFile(path) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode("utf-8")
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    root = ET.fromstring(sheet)
    out = []
    for row in root.findall(".//m:row", ns):
        vals = []
        for c in row.findall("m:c", ns):
            t = c.find("m:is/m:t", ns)
            v = c.find("m:v", ns)
            vals.append(t.text or "" if t is not None else (v.text if v is not None else ""))
        out.append(vals)
    return out

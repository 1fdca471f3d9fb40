"""Minimal XLSX read/write — pure stdlib (zipfile + xml.etree), no openpyxl.

Closes the last AlaSQL file-format row (SURVEY §2 A6: `FROM XLSX()` /
`INTO XLSX()` — package.json:5 tier): an .xlsx file is a zip of XML parts,
and the subset AlaSQL produces/consumes (one sheet, inline strings or a
shared-string table, number cells) parses with the standard library.

Honest scope: ONE worksheet, string/number/boolean cells, first row =
header. No formulas, styles, dates-as-serials, or multiple sheets — a
spreadsheet library owns those. Reads happen on the DRIVER (an .xlsx is not
splittable and AlaSQL's use case is small interchange files); the resulting
DataFrame distributes normally. A 100 TB pipeline would never ship data as
xlsx — this exists for reference-dialect parity at the REPL.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' -> 0, 'B' -> 1, ..., 'AA' -> 26 (cell refs like 'C7')."""
    m = _CELL_REF.match(ref)
    idx = 0
    for ch in (m.group(1) if m else "A"):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def read_xlsx(path: str) -> tuple[list[str], list[list]]:
    """Parse sheet1 of an .xlsx into (header, rows). Cell types: shared
    string (t="s"), inline string (t="inlineStr" / t="str"), boolean
    (t="b"), else number (int when integral)."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(
                    "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"
                )))
        sheet_name = next(
            n for n in zf.namelist()
            if n.startswith("xl/worksheets/") and n.endswith(".xml")
        )
        root = ET.fromstring(zf.read(sheet_name))
        grid: list[list] = []
        for row in root.findall(".//m:row", _NS):
            cells: dict[int, object] = {}
            for c in row.findall("m:c", _NS):
                ref = c.get("r", "A1")
                ctype = c.get("t", "n")
                v = c.find("m:v", _NS)
                if ctype == "s":
                    val: object = shared[int(v.text)] if v is not None else None
                elif ctype == "inlineStr":
                    is_el = c.find("m:is", _NS)
                    val = (
                        "".join(t.text or "" for t in is_el.iter(
                            "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"
                        ))
                        if is_el is not None
                        else None
                    )
                elif ctype == "str":
                    val = v.text if v is not None else None
                elif ctype == "b":
                    val = v is not None and v.text == "1"
                else:  # number
                    if v is None or v.text is None:
                        val = None
                    else:
                        f = float(v.text)
                        val = int(f) if f.is_integer() else f
                cells[_col_index(ref)] = val
            width = max(cells) + 1 if cells else 0
            grid.append([cells.get(i) for i in range(width)])
    if not grid:
        return [], []
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(grid[0])]
    width = len(header)
    rows = [r + [None] * (width - len(r)) for r in grid[1:]]
    return header, rows


_STATIC_PARTS = {
    "[Content_Types].xml": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    ),
    "_rels/.rels": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    ),
    "xl/workbook.xml": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    ),
    "xl/_rels/workbook.xml.rels": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    ),
}


def write_xlsx(header: list[str], rows: list[list], path: str) -> None:
    """Write one worksheet: header row + data rows. Strings go as inline
    strings (no shared-string table needed), numbers as number cells,
    booleans as boolean cells, None as blank."""

    def cell(val: object) -> str:
        if val is None:
            return ""
        if isinstance(val, bool):
            return f'<c t="b"><v>{1 if val else 0}</v></c>'
        if isinstance(val, (int, float)):
            return f"<c><v>{val}</v></c>"
        return f'<c t="inlineStr"><is><t xml:space="preserve">{escape(str(val))}</t></is></c>'

    body = []
    for r, vals in enumerate([list(header)] + [list(r) for r in rows], start=1):
        body.append(f'<row r="{r}">' + "".join(cell(v) for v in vals) + "</row>")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(body) + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in _STATIC_PARTS.items():
            zf.writestr(name, content)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)

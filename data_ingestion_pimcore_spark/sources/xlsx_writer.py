"""Minimal stdlib xlsx writer — test fixture authoring only.

Produces just enough of ECMA-376 for the engine's Excel source to read:
shared strings, inline numbers/bools, styled (date) cells, gaps, and
short rows. NOT a general-purpose writer.
"""

from __future__ import annotations

import zipfile
from typing import Any

_CT_HEAD = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

# style 0: general; style 1: builtin date numFmt 14 (m/d/yyyy)
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14"/></cellXfs>
</styleSheet>"""


class DateCell:
    """Numeric cell styled with a date format (Excel serial number)."""

    def __init__(self, serial: float):
        self.serial = serial


class FormulaCell:
    """A cell carrying a ``<f>`` formula plus its cached ``<v>`` result
    — what Excel writes after calculation. Readers with data_only
    semantics (the reference's openpyxl ``data_only=True``,
    ``excel_reader.py:38``) must surface the CACHED value and never
    evaluate the formula text."""

    def __init__(self, formula: str, cached: Any):
        self.formula = formula
        self.cached = cached


def _col_letter(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(ord("A") + r) + s
    return s


def write_xlsx(
    path: str,
    rows: list[list[Any]],
    more_sheets: list[list[list[Any]]] | None = None,
    active_tab: int = 0,
) -> str:
    """``None`` cells are omitted from the XML (true gaps).

    ``more_sheets`` appends additional worksheets after the first;
    ``active_tab`` sets ``bookViews/workbookView@activeTab`` — the
    sheet a reader honoring ``wb.active`` must pick."""
    shared: list[str] = []
    sidx: dict[str, int] = {}

    def esc(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    def cell_xml(r: int, c: int, v: Any) -> str:
        ref = f"{_col_letter(c)}{r + 1}"
        if isinstance(v, DateCell):
            return f'<c r="{ref}" s="1"><v>{v.serial}</v></c>'
        if isinstance(v, FormulaCell):
            f_xml = f"<f>{esc(v.formula)}</f>"
            if isinstance(v.cached, (int, float)) and not isinstance(
                v.cached, bool
            ):
                return f'<c r="{ref}">{f_xml}<v>{v.cached}</v></c>'
            # string-valued formula result: t="str" per the spec
            return (
                f'<c r="{ref}" t="str">{f_xml}<v>{esc(str(v.cached))}</v></c>'
            )
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        s = str(v)
        if s not in sidx:
            sidx[s] = len(shared)
            shared.append(s)
        return f'<c r="{ref}" t="s"><v>{sidx[s]}</v></c>'

    def sheet_xml(sheet_rows: list[list[Any]]) -> str:
        body = []
        for r, row in enumerate(sheet_rows):
            cells = "".join(
                cell_xml(r, c, v) for c, v in enumerate(row) if v is not None
            )
            body.append(f'<row r="{r + 1}">{cells}</row>')
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{''.join(body)}</sheetData></worksheet>"
        )

    all_sheets = [rows] + list(more_sheets or [])
    sheet_parts = [sheet_xml(s) for s in all_sheets]

    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{esc(s)}</t></si>" for s in shared)
        + "</sst>"
    )

    n = len(all_sheets)
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<bookViews><workbookView activeTab="{active_tab}"/></bookViews>'
        "<sheets>"
        + "".join(
            f'<sheet name="Sheet{i + 1}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i in range(n)
        )
        + "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(n)
        )
        + "</Relationships>"
    )
    ct = _CT_HEAD.format(
        sheet_overrides="".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(n)
        )
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/styles.xml", _STYLES)
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, sx in enumerate(sheet_parts):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", sx)
    return path

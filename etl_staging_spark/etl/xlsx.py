"""Minimal dependency-free styled-xlsx writer (S5).

The container ships no Excel library, but .xlsx is just a zip of OOXML
parts — stdlib ``zipfile`` + string templates cover the registers'
styling contract (reference `etl_account/wizard/sales_report.py:47-225`):

- row 0: merged title cell, large bold, centered;
- row 1: merged subtitle (period line), bold on a gray fill;
- row 2: header row, bold on a gray fill, thin borders;
- data rows: strings left-aligned, numbers right-aligned '#,##0.00';
- last row: totals — bold on a gray fill, one SUM per numeric column,
  computed driver-side from the (already aggregated) rows.

Formatting stays driver-side by design: sinks consume O(report lines)
aggregates, never raw facts, so workbook assembly is not a distributed
concern at any scale.
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

# style ids = index into _CELL_XFS below
S_DEFAULT, S_TITLE, S_SUBTITLE, S_HEADER, S_TEXT, S_NUMBER, S_TOTAL_TEXT, S_TOTAL_NUM = range(8)

_NUMFMT_2D = 164  # first custom numFmt id

_STYLES_XML = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<numFmts count="1"><numFmt numFmtId="{_NUMFMT_2D}" formatCode="#,##0.00;-#,##0.00"/></numFmts>
<fonts count="3">
  <font><sz val="10"/><name val="Arial"/></font>
  <font><b/><sz val="10"/><name val="Arial"/></font>
  <font><b/><sz val="15"/><name val="Arial"/></font>
</fonts>
<fills count="3">
  <fill><patternFill patternType="none"/></fill>
  <fill><patternFill patternType="gray125"/></fill>
  <fill><patternFill patternType="solid"><fgColor rgb="FFC0C0C0"/></patternFill></fill>
</fills>
<borders count="2">
  <border><left/><right/><top/><bottom/><diagonal/></border>
  <border><left style="thin"/><right style="thin"/><top style="thin"/><bottom style="thin"/><diagonal/></border>
</borders>
<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>
<cellXfs count="8">
  <xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>
  <xf numFmtId="0" fontId="2" fillId="0" borderId="1" applyAlignment="1"><alignment horizontal="center" vertical="center"/></xf>
  <xf numFmtId="0" fontId="1" fillId="2" borderId="1" applyAlignment="1"><alignment horizontal="left" vertical="center"/></xf>
  <xf numFmtId="0" fontId="1" fillId="2" borderId="1" applyAlignment="1"><alignment horizontal="center" vertical="center" wrapText="1"/></xf>
  <xf numFmtId="0" fontId="0" fillId="0" borderId="0" applyAlignment="1"><alignment horizontal="left"/></xf>
  <xf numFmtId="{_NUMFMT_2D}" fontId="0" fillId="0" borderId="0" applyAlignment="1"><alignment horizontal="right"/></xf>
  <xf numFmtId="0" fontId="1" fillId="2" borderId="1" applyAlignment="1"><alignment horizontal="left"/></xf>
  <xf numFmtId="{_NUMFMT_2D}" fontId="1" fillId="2" borderId="1" applyAlignment="1"><alignment horizontal="right"/></xf>
</cellXfs>
</styleSheet>"""

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell(row: int, col: int, value, style: int) -> str:
    ref = f"{_col_letter(col)}{row + 1}"
    if value is None:
        return f'<c r="{ref}" s="{style}"/>'
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return f'<c r="{ref}" s="{style}"><v>{value!r}</v></c>'
    return (
        f'<c r="{ref}" s="{style}" t="inlineStr">'
        f"<is><t xml:space=\"preserve\">{escape(str(value))}</t></is></c>"
    )


def write_styled_xlsx(
    path: str,
    columns: list[str],
    rows: list[list],
    number_cols: set[int],
    total_cols: set[int] | None = None,
    title: str = "Report",
    subtitle: str = "",
    sheet_name: str = "Sheet1",
) -> dict:
    """Write the register workbook; returns a summary dict with the
    computed ``totals`` (by column index) for callers/tests."""
    total_cols = set(total_cols if total_cols is not None else number_cols)
    n_cols = len(columns)
    totals = {
        c: sum(float(r[c]) for r in rows if r[c] is not None) for c in total_cols
    }

    xml_rows = []
    span = f"1:{max(n_cols, 1)}"
    xml_rows.append(
        f'<row r="1" spans="{span}">' + _cell(0, 0, title, S_TITLE)
        + "".join(_cell(0, c, None, S_TITLE) for c in range(1, n_cols)) + "</row>"
    )
    xml_rows.append(
        f'<row r="2" spans="{span}">' + _cell(1, 0, subtitle, S_SUBTITLE)
        + "".join(_cell(1, c, None, S_SUBTITLE) for c in range(1, n_cols)) + "</row>"
    )
    xml_rows.append(
        f'<row r="3" spans="{span}">'
        + "".join(_cell(2, c, name, S_HEADER) for c, name in enumerate(columns))
        + "</row>"
    )
    r = 3
    for row in rows:
        cells = "".join(
            _cell(r, c, v, S_NUMBER if c in number_cols else S_TEXT)
            for c, v in enumerate(row)
        )
        xml_rows.append(f'<row r="{r + 1}" spans="{span}">{cells}</row>')
        r += 1
    total_cells = []
    for c in range(n_cols):
        if c in total_cols:
            total_cells.append(_cell(r, c, round(totals[c], 2), S_TOTAL_NUM))
        else:
            total_cells.append(_cell(r, c, "Total" if c == 0 else None, S_TOTAL_TEXT))
    xml_rows.append(f'<row r="{r + 1}" spans="{span}">{"".join(total_cells)}</row>')

    merges = (
        f'<mergeCells count="2">'
        f'<mergeCell ref="A1:{_col_letter(n_cols - 1)}1"/>'
        f'<mergeCell ref="A2:{_col_letter(n_cols - 1)}2"/>'
        f"</mergeCells>"
        if n_cols > 1
        else ""
    )
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(xml_rows)}</sheetData>{merges}</worksheet>"
    )
    wb_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", wb_xml)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/styles.xml", _STYLES_XML)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return {"path": path, "n_rows": len(rows), "totals": totals}


def write_register_xlsx(df, path: str, title: str, subtitle: str = "",
                        total_cols: list[str] | None = None) -> dict:
    """S5 register sink: collect the aggregated register DataFrame
    (O(report lines)) and emit the styled workbook. Numeric columns get
    the 2-dp right-aligned format; ``total_cols`` (default: all numeric
    columns) are summed into the bold gray totals row."""
    numeric = {
        i for i, f in enumerate(df.schema.fields)
        if f.dataType.typeName() in
        ("double", "float", "decimal", "integer", "long", "short")
    }
    cols = df.columns
    if total_cols is None:
        tset = numeric
    else:
        tset = {cols.index(c) for c in total_cols}
    rows = [[row[c] for c in cols] for row in df.collect()]
    return write_styled_xlsx(path, cols, rows, numeric, tset, title, subtitle)

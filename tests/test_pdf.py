"""The dependency-free PDF 1.4 writer (`reports/pdf.py`): structural
validity is asserted byte-for-byte — header/EOF framing, an xref table
whose every offset lands exactly on its object header, page count and
Kids wiring — and the content is greppable because streams are
deliberately uncompressed (title, formatted values, escaping,
footnote numbering shared with the HTML path)."""

from __future__ import annotations

import re

from etl_staging_spark.reports.pdf import render_report_pdf, write_report_pdf


def _lines(n: int) -> list[dict]:
    # realistic assembled cells carry the display 'name' (the colspan
    # pass keys off it, exactly like the HTML path); no_format rides
    # along as the raw value
    return [
        {"id": f"l{i}", "name": f"Row {i}", "level": i % 3,
         "columns": [{"name": f"{100.0 + i:.2f}", "no_format": 100.0 + i},
                     {"name": "-2.50", "no_format": -2.5}]}
        for i in range(n)
    ]


def _parse_xref(pdf: bytes) -> dict[int, int]:
    at = int(pdf[pdf.rindex(b"startxref") + 9:].split()[0])
    assert pdf[at:at + 4] == b"xref"
    header = pdf[at:].split(b"\n", 2)
    n = int(header[1].split()[1])
    table = pdf[at:].split(b"\n")[2:2 + n]
    out = {}
    for oid, row in enumerate(table):
        off, gen, kind = row.split()[:3]
        if kind == b"n":
            out[oid] = int(off)
    return out


def test_pdf_structure_and_xref_offsets():
    pdf = render_report_pdf("Trial Balance", ["Debit", "Credit"], _lines(5))
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    offsets = _parse_xref(pdf)
    assert offsets, "xref table empty"
    for oid, off in offsets.items():
        assert pdf[off:].startswith(f"{oid} 0 obj".encode()), oid
    # single page: /Count 1 and one /Type /Page
    assert b"/Count 1" in pdf
    assert pdf.count(b"/Type /Page ") == 1
    # uncompressed streams keep the content greppable
    assert b"(Trial Balance)" in pdf
    assert b"(100.00)" in pdf and b"(-2.50)" in pdf  # monetary format


def test_pdf_paginates_and_repeats_headers():
    from etl_staging_spark.reports.pdf import _rows_per_page

    n = _rows_per_page() + 5
    pdf = render_report_pdf("Long Report", ["V"], _lines(n))
    assert f"/Count 2".encode() in pdf
    assert pdf.count(b"/Type /Page ") == 2
    assert pdf.count(b"(Long Report)") == 2  # title re-drawn per page
    assert pdf.count(b"(V)") == 2            # headers re-drawn per page
    offsets = _parse_xref(pdf)
    for oid, off in offsets.items():
        assert pdf[off:].startswith(f"{oid} 0 obj".encode()), oid
    # every row made it onto some page
    assert pdf.count(b"(Row ".replace(b" ", b" ")) >= n


def test_pdf_escapes_and_encodes():
    pdf = render_report_pdf(
        "Ledger (2026) \\ draft", ["V"],
        [{"id": "x", "name": "a(b)c\\d", "columns": [{"name": "n/a"}]}],
    )
    assert rb"(Ledger \(2026\) \\ draft)" in pdf
    assert rb"(a\(b\)c\\d)" in pdf
    # non-latin glyphs degrade to '?', never a crash or a broken string
    pdf2 = render_report_pdf("T", ["V"], [
        {"id": "u", "name": "日本語", "columns": [{"name": "β"}]}])
    assert b"(???)" in pdf2


def test_pdf_footnotes_and_groups_match_html_numbering():
    lines = [
        {"id": "a", "name": "Assets",
         "columns": [{"name": "1.00"}, {"name": "1.00"}]},
        {"id": "b", "name": "Liabilities",
         "columns": [{"name": "2.00"}, {"name": "2.00"}]},
    ]
    pdf = render_report_pdf(
        "R", ["P1", "P2"], lines,
        column_groups=[("FY2026", 2)],
        footnotes={"b": "includes provisions", "zz": "hidden line skipped"},
    )
    assert b"(FY2026)" in pdf
    assert b"(Liabilities [1])" in pdf           # visible-order numbering
    assert b"([1] includes provisions)" in pdf
    assert b"hidden line skipped" not in pdf     # invisible line: no note


def test_pdf_colspan_offsets_values_like_html():
    """r13 review fix: apply_colspans slices leading empty cells into
    the name span, so the first remaining value belongs to column
    (colspan - 1) — a line whose only value is in the SECOND column
    must right-align under the second header, exactly where the HTML
    export renders it, not under the first."""
    from etl_staging_spark.reports.pdf import (
        BODY_SIZE, COURIER_EM, MARGIN, NAME_FRAC, PAGE_W,
    )

    # ONE line, first cell empty: no sibling pins the key's colspan to
    # 1, so apply_colspans genuinely sets colspan=2 and slices the
    # empty cell away — reverting the offset fix puts 9.99 under
    # Budget and fails this test (the first fixture had a sibling
    # whose column-1 value froze colspan at 1, exercising nothing)
    lines = [
        {"id": "late", "name": "SecondOnly",
         "columns": [{"name": ""}, {"name": "9.99"}]},
    ]
    pdf = render_report_pdf("R", ["Budget", "Actual"], lines)
    usable = PAGE_W - 2 * MARGIN
    name_w = usable * NAME_FRAC
    val_w = (usable - name_w) / 2
    second_right = MARGIN + name_w + 2 * val_w
    x999 = second_right - COURIER_EM * BODY_SIZE * len("9.99")
    # the 9.99 draw op right-aligns at the SECOND column edge
    assert f"{x999:.1f}".encode() in pdf
    ops = [l for l in pdf.decode("latin-1").splitlines() if "(9.99)" in l]
    assert ops and f"{x999:.1f}" in ops[0]


def test_export_pdf_writes_real_pdf_without_backend(tmp_path):
    """export_pdf no longer raises in a backend-free container — the
    built-in writer is the fallback, so the export is a real PDF
    either way (the pre-r13 behavior wrote a .html side file and
    raised RuntimeError)."""
    from etl_staging_spark.reports.html import export_pdf

    target = str(tmp_path / "report.pdf")
    out = export_pdf(target, "R", ["V"],
                     [{"id": "l", "name": "n", "columns": [{"no_format": 1.0}]}])
    assert out == target
    pdf = open(target, "rb").read()
    assert pdf.startswith(b"%PDF-1.4") and b"(R)" in pdf


def test_write_report_pdf_roundtrip(tmp_path):
    p = write_report_pdf(str(tmp_path / "t.pdf"), "T", ["V"], _lines(2))
    assert open(p, "rb").read().startswith(b"%PDF-1.4")

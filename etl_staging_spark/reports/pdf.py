"""Dependency-free PDF export of assembled report lines — the last
mile the reference ships by shelling out to wkhtmltopdf
(`account_report.py:4192-4245` renders the print HTML and hands it to
the binary). This container has no HTML->PDF binary and no PDF
library, so the gap is closed the honest way: a minimal PDF 1.4
WRITER (standard 14 fonts, explicit xref table, uncompressed content
streams) that renders the SAME assembled-line structure the HTML path
renders — title, optional column-group band, column headers, one row
per visible line with level indentation and right-aligned values, and
print-mode footnotes. Uncompressed streams are deliberate: the output
stays greppable for tests (and humans) without a PDF parser, at a few
KB per page for tabular reports.

Layout is exact, not approximate: the body uses Courier (every glyph
0.6 em wide in the standard metrics), so right-alignment is integer
arithmetic — no font-metric tables to embed and nothing for engines
to disagree about.
"""

from __future__ import annotations

from .assemble import attach_footnotes, format_value
from .html import apply_colspans

PAGE_W, PAGE_H = 842.0, 595.0  # A4 landscape, points
MARGIN = 40.0
TITLE_SIZE = 12.0
BODY_SIZE = 8.0
LEADING = 11.0
COURIER_EM = 0.6  # standard Courier advance width per glyph, em units
NAME_FRAC = 0.4   # name column share of the usable width
INDENT_PT = 10.0  # per hierarchy level


def _esc(s: str) -> str:
    """PDF literal-string escape in WinAnsiEncoding. cp1252 IS
    WinAnsi, so the stdlib codec does the whole mapping — latin-1 plus
    the 0x80-0x9F glyph block (an em-dash title or _clip's own '…'
    marker renders, not '?'); glyphs outside WinAnsi degrade to '?'
    (the standard-14 fonts carry no wider encoding). The cp1252 bytes
    are re-read as latin-1 purely to get a str whose code points equal
    the bytes the content stream will carry."""
    out = str(s).encode("cp1252", "replace").decode("latin-1")
    return out.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _clip(s: str, max_chars: int) -> str:
    return s if len(s) <= max_chars else s[: max(0, max_chars - 1)] + "…"


def _text_op(x: float, y: float, s: str, font: str = "/F1",
             size: float = BODY_SIZE) -> str:
    return f"BT {font} {size:g} Tf {x:.1f} {y:.1f} Td ({_esc(s)}) Tj ET"


def _right(x_right: float, s: str, size: float = BODY_SIZE) -> float:
    """x so a Courier string ENDS at x_right — exact, every glyph 0.6 em."""
    return x_right - COURIER_EM * size * len(s)


def _rows_per_page() -> int:
    usable = PAGE_H - 2 * MARGIN - (TITLE_SIZE + 2 * LEADING)
    return int(usable // LEADING)


def render_report_pdf(
    title: str,
    column_headers: list[str],
    lines: list[dict],
    *,
    column_groups: list[tuple[str, int]] | None = None,
    figure_type: str | None = "monetary",
    footnotes: dict[str, str] | None = None,
) -> bytes:
    """Assembled lines -> complete PDF bytes (header, objects, xref,
    trailer). Same inputs as `html.render_report_html`; the footnote
    pass reuses the HTML path's visible-order numbering so the two
    exports can never number differently."""
    lines = apply_colspans([dict(l) for l in lines])
    notes = attach_footnotes(lines, footnotes) if footnotes else []

    usable_w = PAGE_W - 2 * MARGIN
    name_w = usable_w * NAME_FRAC
    n_vals = max(1, len(column_headers))
    val_w = (usable_w - name_w) / n_vals
    name_chars = int(name_w / (COURIER_EM * BODY_SIZE))
    val_chars = int(val_w / (COURIER_EM * BODY_SIZE))

    def val_right_edge(i: int) -> float:
        return MARGIN + name_w + (i + 1) * val_w

    # --- paginate body rows -------------------------------------------------
    pages: list[list[str]] = []
    ops: list[str] = []
    y = 0.0

    def open_page() -> None:
        nonlocal ops, y
        ops = []
        y = PAGE_H - MARGIN - TITLE_SIZE
        ops.append(_text_op(MARGIN, y, title, font="/F2", size=TITLE_SIZE))
        y -= 2 * LEADING
        if column_groups:
            x = MARGIN + name_w
            for label, span in column_groups:
                edge = x + span * val_w
                s = _clip(str(label), max(1, int(span * val_w
                                                 / (COURIER_EM * BODY_SIZE))))
                ops.append(_text_op(_right(edge, s), y, s))
                x = edge
            y -= LEADING
        for i, h in enumerate(column_headers):
            s = _clip(str(h), val_chars)
            ops.append(_text_op(_right(val_right_edge(i), s), y, s))
        y -= LEADING

    def close_page() -> None:
        pages.append(ops)

    def emit_row(emit) -> None:
        nonlocal y
        if y < MARGIN:
            close_page()
            open_page()
        emit(y)
        y -= LEADING

    open_page()
    for line in lines:
        def _emit(row_y: float, line=line) -> None:
            level = int(line.get("level", 0) or 0)
            name = str(line.get("name", ""))
            if line.get("footnote"):
                name += f" [{line['footnote']}]"
            indent = MARGIN + INDENT_PT * level
            room = max(1, int((MARGIN + name_w - indent)
                              / (COURIER_EM * BODY_SIZE)))
            ops.append(_text_op(indent, row_y, _clip(name, room)))
            # apply_colspans sliced the leading empty cells into the
            # name span: the first remaining value belongs to column
            # (colspan - 1), exactly where the HTML export renders it
            offset = int(line.get("colspan", 1) or 1) - 1
            for i, col in enumerate(line.get("columns") or []):
                shown = col.get("name")
                if shown is None:
                    shown = format_value(col.get("no_format"), figure_type)
                s = _clip(str(shown), val_chars)
                ops.append(
                    _text_op(_right(val_right_edge(i + offset), s), row_y, s)
                )
        emit_row(_emit)
    for note in notes:
        def _emit(row_y: float, note=note) -> None:
            s = _clip(f"[{note['number']}] {note['text']}",
                      name_chars + n_vals * val_chars)
            ops.append(_text_op(MARGIN, row_y, s))
        emit_row(_emit)
    close_page()

    # --- assemble objects + xref -------------------------------------------
    # 1 Catalog, 2 Pages, 3 /F1 Courier, 4 /F2 Helvetica-Bold, then per
    # page: Page object, Contents stream.
    n_pages = len(pages)
    page_ids = [5 + 2 * i for i in range(n_pages)]
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: ("<< /Type /Pages /Count %d /Kids [%s] >>" % (
            n_pages, " ".join(f"{pid} 0 R" for pid in page_ids)
        )).encode(),
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
           b" /Encoding /WinAnsiEncoding >>",
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold"
           b" /Encoding /WinAnsiEncoding >>",
    }
    for i, page_ops in enumerate(pages):
        pid, cid = page_ids[i], page_ids[i] + 1
        stream = "\n".join(page_ops).encode("latin-1")
        objs[pid] = (
            f"<< /Type /Page /Parent 2 0 R"
            f" /MediaBox [0 0 {PAGE_W:g} {PAGE_H:g}]"
            f" /Resources << /Font << /F1 3 0 R /F2 4 0 R >> >>"
            f" /Contents {cid} 0 R >>"
        ).encode()
        objs[cid] = (
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + stream + b"\nendstream"
        )

    buf = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for oid in sorted(objs):
        offsets[oid] = len(buf)
        buf += f"{oid} 0 obj\n".encode() + objs[oid] + b"\nendobj\n"
    xref_at = len(buf)
    n_objs = max(objs) + 1
    buf += f"xref\n0 {n_objs}\n".encode()
    buf += b"0000000000 65535 f \n"
    for oid in range(1, n_objs):
        buf += f"{offsets[oid]:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(buf)


def write_report_pdf(path: str, *args, **kwargs) -> str:
    with open(path, "wb") as fh:
        fh.write(render_report_pdf(*args, **kwargs))
    return path

"""HTML export of assembled report lines — the `get_html` last mile
(`account_reports/models/account_report.py:3745-3795`, plus the
colspan pass `:3655-3744` and the footnote block `:3797-3810`).

Driver-side over ASSEMBLED lines (O(report lines)), like every sink:
the data-sized work happened upstream in the engines. No template
library — the qweb `main_template` boils down to a header table +
one <tr> per line with level/markup classes, which stdlib string
assembly covers.

PDF export in the reference shells out to wkhtmltopdf
(`account_report.py:4192-4245`); :func:`export_pdf` uses an
importable HTML->PDF backend when one exists (full CSS fidelity) and
otherwise renders the same assembled lines through the built-in
dependency-free PDF 1.4 writer (:mod:`.pdf`, r13) — a real PDF either
way, never a gap.
"""

from __future__ import annotations

import math
from xml.sax.saxutils import escape

from .assemble import attach_footnotes, format_value, get_markup

_CSS = """
table.account-report { border-collapse: collapse; font: 13px sans-serif; }
.account-report th, .account-report td { padding: 2px 8px; border-bottom: 1px solid #ddd; }
.account-report th { background: #f0f0f0; text-align: center; }
.account-report td.number { text-align: right; font-variant-numeric: tabular-nums; }
.account-report tr.total td { font-weight: bold; border-top: 1px solid #888; }
.account-report .color-red { color: #b00020; }
.account-report .color-green { color: #00701a; }
sup.footnote { font-size: 9px; }
ol.footnotes { font: 11px sans-serif; }
"""


def apply_colspans(lines: list[dict]) -> list[dict]:
    """`_format_lines_for_display` (`account_report.py:3655-3744`):
    when a report has multiple columns, leading empty cells of each
    line merge into the name cell's colspan. The merge width is
    decided PER (level, root/child) KEY — the minimum, over lines with
    that key, of the first column index holding a value — so sibling
    lines stay column-aligned. Lines with no values at all span the
    whole row. Mutates and returns ``lines``."""
    if not lines or max(len(l.get("columns") or []) for l in lines) <= 1:
        for line in lines:
            line.setdefault("colspan", 1)
        return lines

    def key(line: dict) -> str:
        return f"{line.get('level')}_{'child' if line.get('parent_id') else 'root'}"

    def has_value(column: dict) -> bool:
        # the reference decides on the pre-rendered display string
        # (`name`); this port also renders cells late from `no_format`
        # (+ figure_type at export time), so a raw value — including a
        # genuine 0.0 — must count as occupied or multi-column reports
        # whose cells are no_format-only get their values silently
        # merged away (the r13 review's empty-PDF finding)
        return bool(column.get("name")) or column.get("no_format") is not None

    max_colspan_by_key: dict[str, float] = {}
    for line in lines:
        for index, column in enumerate(line.get("columns") or [], start=1):
            if has_value(column) and index < max_colspan_by_key.get(key(line), math.inf):
                max_colspan_by_key[key(line)] = index
                break
    for line in lines:
        if line.get("colspan"):
            continue
        max_colspan = max_colspan_by_key.get(key(line))
        if max_colspan is not None:
            line["colspan"] = max_colspan
            line["columns"] = list(line.get("columns") or [])[max_colspan - 1:]
        else:
            line["colspan"] = len(line.get("columns") or []) + 1
            line["columns"] = []
    return lines


def flag_negative_cells(lines: list[dict]) -> None:
    """Negative numeric cells get the ``number color-red`` class
    (`account_report.py:3760-3767`)."""
    for line in lines:
        for col in line.get("columns") or []:
            value = col.get("no_format")
            if isinstance(value, (int, float)) and not isinstance(value, bool) and round(value, 2) < 0:
                col["class"] = "number color-red"


def _header_html(column_groups: list[tuple[str, int]] | None,
                 column_headers: list[str]) -> str:
    out = []
    if column_groups:
        cells = "".join(
            f'<th colspan="{span}">{escape(str(label))}</th>'
            for label, span in column_groups
        )
        out.append(f"<tr><th></th>{cells}</tr>")
    cells = "".join(f"<th>{escape(str(h))}</th>" for h in column_headers)
    out.append(f"<tr><th></th>{cells}</tr>")
    return "".join(out)


def _line_html(line: dict, figure_type: str | None) -> str:
    classes = [f"level-{line.get('level', 0)}"]
    markup = get_markup(line.get("id"))
    if markup:
        classes.append(markup)
    indent = 16 * int(line.get("level", 0) or 0)
    foot = (
        f'<sup class="footnote">{escape(str(line["footnote"]))}</sup>'
        if line.get("footnote")
        else ""
    )
    name_cell = (
        f'<td colspan="{line.get("colspan", 1)}" style="padding-left:{indent}px">'
        f"{escape(str(line.get('name', '')))}{foot}</td>"
    )
    value_cells = []
    for col in line.get("columns") or []:
        cls = col.get("class") or "number"
        shown = col.get("name")
        if shown is None:
            shown = format_value(col.get("no_format"), figure_type)
        value_cells.append(f'<td class="{escape(cls)}">{escape(str(shown))}</td>')
    return f'<tr class="{" ".join(classes)}">{name_cell}{"".join(value_cells)}</tr>'


def render_report_html(
    title: str,
    column_headers: list[str],
    lines: list[dict],
    *,
    column_groups: list[tuple[str, int]] | None = None,
    figure_type: str | None = "monetary",
    footnotes: dict[str, str] | None = None,
    print_mode: bool = False,
) -> str:
    """The `get_html` pipeline over assembled lines: colspan pass,
    negative flagging, header + line rows, and (print mode only)
    visible-order footnote numbering with the rendered footnote list
    appended — numbering skips hidden lines exactly like the
    reference's print path."""
    lines = apply_colspans([dict(l) for l in lines])
    flag_negative_cells(lines)
    to_render = []
    if print_mode and footnotes:
        to_render = attach_footnotes(lines, footnotes)
    body = "".join(_line_html(line, figure_type) for line in lines)
    foot_html = ""
    if to_render:
        items = "".join(
            f'<li value="{f["number"]}">{escape(f["text"])}</li>' for f in to_render
        )
        foot_html = f'<ol class="footnotes">{items}</ol>'
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<style>{_CSS}</style><title>{escape(title)}</title></head><body>"
        f"<h2>{escape(title)}</h2>"
        f'<table class="account-report"><thead>'
        f"{_header_html(column_groups, column_headers)}</thead>"
        f"<tbody>{body}</tbody></table>{foot_html}</body></html>"
    )


def write_report_html(path: str, *args, **kwargs) -> str:
    html = render_report_html(*args, **kwargs)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(html)
    return path


def export_pdf(path: str, title: str, column_headers: list[str],
               lines: list[dict], **kwargs) -> str:
    """PDF export (`account_report.py:4192-4245` shells out to
    wkhtmltopdf over the print HTML): an importable HTML->PDF backend
    gets full CSS fidelity; absent one — this container ships none —
    the built-in dependency-free PDF 1.4 writer (`reports.pdf`)
    renders the SAME assembled lines directly, so the export is a real
    PDF either way, never a gap. The print-mode kwargs
    (column_groups / figure_type / footnotes) pass through to both
    backends; HTML-only kwargs are accepted for the weasyprint path
    and ignored by the writer."""
    try:  # pragma: no cover - not installed in this container
        import weasyprint  # type: ignore

        html = render_report_html(title, column_headers, lines,
                                  print_mode=True, **kwargs)
        weasyprint.HTML(string=html).write_pdf(path)
        return path
    except ImportError:
        from .pdf import write_report_pdf

        accepted = {"column_groups", "figure_type", "footnotes"}
        return write_report_pdf(
            path, title, column_headers, lines,
            **{k: v for k, v in kwargs.items() if k in accepted},
        )

"""Tests for driver-side line-tree assembly (O3 sort port + O4 prefix
regroup) — mirrors the reference's _sort_lines docstring example."""

from __future__ import annotations

from etl_staging_spark.reports.assemble import prefix_groups, sort_lines


def _line(lid, parent, val):
    return {"id": lid, "parent_id": parent, "columns": [{"no_format": val}]}


def _tree():
    return [
        _line("line~p1", None, 11.0),
        _line("line~c1", "line~p1", 1.0),
        _line("line~c2", "line~p1", 3.0),
        _line("line~c3", "line~p1", 2.0),
        _line("total~p1", "line~p1", 999.0),
        _line("line~p2", None, 10.0),
        _line("line~c7", "line~p2", 5.0),
        _line("line~c8", "line~p2", 6.0),
        _line("total~p2", "line~p2", 999.0),
    ]


def test_sort_ascending_totals_pinned():
    out = [x["id"] for x in sort_lines(_tree(), 1)]
    assert out == [
        "line~p2", "line~c7", "line~c8", "total~p2",
        "line~p1", "line~c1", "line~c3", "line~c2", "total~p1",
    ]


def test_sort_descending_totals_still_last():
    out = [x["id"] for x in sort_lines(_tree(), -1)]
    assert out == [
        "line~p1", "line~c2", "line~c3", "line~c1", "total~p1",
        "line~p2", "line~c8", "line~c7", "total~p2",
    ]


def test_sort_mixed_types_by_type_class():
    lines = [
        _line("line~a", None, "zz"),
        _line("line~b", None, None),
        _line("line~c", None, 5.0),
        _line("line~d", None, True),
    ]
    out = [x["id"] for x in sort_lines(lines, 1)]
    # None < bool < number < str
    assert out == ["line~b", "line~d", "line~c", "line~a"]


def test_sort_zero_column_is_noop():
    lines = _tree()
    assert sort_lines(lines, 0) is lines


def test_prefix_groups_recursive():
    names = ["apple", "apricot", "avocado", "banana", "blueberry", "cherry"]
    out = prefix_groups(names, threshold=2)
    assert set(out) == {"A", "B", "C"}
    # the A bucket exceeds the threshold -> regroups one char deeper
    assert set(out["A"]) == {"AP", "AV"}
    assert out["A"]["AP"] == ["apple", "apricot"]
    assert out["B"] == ["banana", "blueberry"]


def test_prefix_groups_under_threshold_flat():
    assert prefix_groups(["a", "b"], threshold=5) == {"": ["a", "b"]}


def test_create_hierarchy_rollup_and_order():
    from etl_staging_spark.reports.assemble import create_hierarchy

    groups = [
        {"prefix": "1", "name": "Class 1", "parent": None},
        {"prefix": "10", "name": "Group 10", "parent": "1"},
        {"prefix": "2", "name": "Class 2", "parent": None},
    ]
    accounts = [
        {"code": "101", "name": "Cash", "columns": [{"no_format": 10.0}, {"no_format": 1.0}]},
        {"code": "104", "name": "Bank", "columns": [{"no_format": 5.0}, {"no_format": 2.0}]},
        {"code": "120", "name": "Recv", "columns": [{"no_format": 7.0}, {"no_format": 0.0}]},
        {"code": "201", "name": "Pay", "columns": [{"no_format": -3.0}, {"no_format": 4.0}]},
        {"code": "900", "name": "Odd", "columns": [{"no_format": 2.0}, {"no_format": 9.0}]},
    ]
    out = create_hierarchy(accounts, groups)
    ids = [l["id"] for l in out]
    # depth-first: class 1 -> group 10 (101, 104) -> 120 (directly under
    # class 1) -> class 2 -> 201; no-group node last
    assert ids == [
        "group~1", "group~10", "account~101", "account~104", "account~120",
        "group~2", "account~201", "group~", "account~900",
    ]
    by_id = {l["id"]: l for l in out}
    # parent-chain rollup, per column
    assert [c["no_format"] for c in by_id["group~10"]["columns"]] == [15.0, 3.0]
    assert [c["no_format"] for c in by_id["group~1"]["columns"]] == [22.0, 3.0]
    assert [c["no_format"] for c in by_id["group~2"]["columns"]] == [-3.0, 4.0]
    assert [c["no_format"] for c in by_id["group~"]["columns"]] == [2.0, 9.0]
    # levels follow the tree
    assert by_id["group~1"]["level"] == 0
    assert by_id["group~10"]["level"] == 1
    assert by_id["account~101"]["level"] == 2
    assert by_id["account~120"]["level"] == 1
    assert by_id["account~120"]["parent_id"] == "group~1"
    assert by_id["account~900"]["parent_id"] == "group~"


def test_create_hierarchy_no_groups_at_all():
    from etl_staging_spark.reports.assemble import create_hierarchy

    accounts = [{"code": "101", "name": "Cash", "columns": [{"no_format": 1.0}]}]
    out = create_hierarchy(accounts, [])
    assert [l["id"] for l in out] == ["group~", "account~101"]
    assert out[0]["columns"][0]["no_format"] == 1.0


def test_growth_comparison_colors():
    from etl_staging_spark.reports.assemble import growth_comparison_data as g

    assert g(110.0, 100.0) == {"name": "10.0%", "class": "number color-green"}
    assert g(90.0, 100.0) == {"name": "-10.0%", "class": "number color-red"}
    # compared value ~0 -> n/a
    assert g(50.0, 0.04) == {"name": "n/a", "class": "number"}
    # negative compared figure flips the color: -1000 -> 1000 is growth
    assert g(1000.0, -1000.0) == {"name": "-200.0%", "class": "number color-green"}
    assert g(-1500.0, -1000.0) == {"name": "50.0%", "class": "number color-red"}
    # green_on_positive=False inverts
    assert g(110.0, 100.0, green_on_positive=False) == {
        "name": "10.0%", "class": "number color-red"
    }
    assert g(100.0, 100.0) == {"name": "0.0%", "class": "number"}


def test_add_growth_comparison_layout_lines():
    from etl_staging_spark.reports.assemble import add_growth_comparison

    lines = [
        {"id": "a", "columns": [{"no_format": 110.0}, {"no_format": 100.0}]},
        {"id": "b", "columns": [{"no_format": None}, {"no_format": None}]},
    ]
    add_growth_comparison(lines)
    assert lines[0]["growth_comparison_data"]["name"] == "10.0%"
    assert lines[1]["growth_comparison_data"] == {"name": "", "class": ""}


def test_hide_if_zero_subtree():
    from etl_staging_spark.reports.assemble import hide_if_zero

    lines = [
        {"id": "s1", "parent_id": None, "columns": [{"no_format": 0.0}]},
        {"id": "s1c", "parent_id": "s1", "columns": [{"no_format": 0.0}]},
        {"id": "s2", "parent_id": None, "columns": [{"no_format": 0.0}]},
        {"id": "s2c", "parent_id": "s2", "columns": [{"no_format": 5.0}]},
    ]
    out = hide_if_zero(lines, {"s1", "s2"})
    # s1 subtree is all-zero -> hidden (incl. child); s2 survives via child
    assert [l["id"] for l in out] == ["s2", "s2c"]


def test_totals_below_sections_nested():
    from etl_staging_spark.reports.assemble import add_totals_below_sections

    lines = [
        {"id": "a", "parent_id": None, "name": "A", "columns": [{"no_format": 3.0}]},
        {"id": "a1", "parent_id": "a", "name": "A1", "columns": [{"no_format": 1.0}]},
        {"id": "a1x", "parent_id": "a1", "name": "A1X", "columns": [{"no_format": 1.0}]},
        {"id": "a2", "parent_id": "a", "name": "A2", "columns": [{"no_format": 2.0}]},
        {"id": "b", "parent_id": None, "name": "B", "columns": [{"no_format": 9.0}]},
    ]
    out = add_totals_below_sections(lines)
    ids = [l["id"] for l in out]
    # A1's total closes before A2; A's total closes before B
    assert ids == ["a", "a1", "a1x", "total~a1", "a2", "total~a", "b"]
    by_id = {l["id"]: l for l in out}
    assert by_id["total~a"]["name"] == "Total A"
    assert by_id["total~a"]["parent_id"] == "a"
    assert by_id["total~a1"]["level"] == by_id["a1"].get("level", 0) + 1


def test_footnote_numbering_follows_visibility():
    from etl_staging_spark.reports.assemble import attach_footnotes

    lines = [{"id": "~a~1"}, {"id": "~a~2"}, {"id": "~a~3"}]
    notes = {"~a~3": "first by key, second by render order",
             "~a~1": "renders first",
             "~hidden~9": "not visible -> skipped"}
    rendered = attach_footnotes(lines, notes)
    assert [r["number"] for r in rendered] == [1, 2]
    assert lines[0]["footnote"] == "1"
    assert "footnote" not in lines[1]
    assert lines[2]["footnote"] == "2"
    assert rendered[1]["text"].startswith("first by key")


def test_format_value_contract():
    from etl_staging_spark.reports.assemble import format_value

    assert format_value(1234567.891, "monetary") == "1,234,567.89"
    assert format_value(1234567.891, "monetary", rounding_unit="thousands") == "1,234.57"
    assert format_value(1234567.891, "monetary", rounding_unit="millions") == "1.23"
    assert format_value(None, "monetary") == ""
    assert format_value(0.0, "monetary") == ""
    # -0.004 is zero at 2 digits: blanked by default, abs()'d when shown
    assert format_value(-0.004, "monetary") == ""
    assert format_value(-0.004, "monetary", blank_if_zero=False) == "0.00"
    assert format_value(12.345, "percentage", digits=1) == "12.3%"
    assert format_value(42.9, "integer") == "43"
    assert format_value("raw", "none") == "raw"


def test_html_colspan_pass_per_level_key():
    """`_format_lines_for_display` contract: the name-cell colspan is
    the per-(level, root/child) minimum first-valued column index, and
    value-free lines span the whole row."""
    from etl_staging_spark.reports.html import apply_colspans

    lines = apply_colspans([
        # root level 0: first valued column is index 2 on one line,
        # index 1 on the other -> key minimum is 1 -> no merge
        {"id": "a", "level": 0, "columns": [{}, {"name": "5.0"}]},
        {"id": "b", "level": 0, "columns": [{"name": "1.0"}, {"name": "2.0"}]},
        # children of a: both lines start at column 2 -> colspan 2
        {"id": "c", "level": 1, "parent_id": "a",
         "columns": [{}, {"name": "7.0"}]},
        {"id": "d", "level": 1, "parent_id": "a",
         "columns": [{}, {"name": "8.0"}]},
        # layout line without values spans everything
        {"id": "e", "level": 0, "parent_id": "a", "columns": [{}, {}]},
    ])
    assert lines[0]["colspan"] == 1 and len(lines[0]["columns"]) == 2
    assert lines[2]["colspan"] == 2 and len(lines[2]["columns"]) == 1
    assert lines[3]["colspan"] == 2
    assert lines[4]["colspan"] == 3 and lines[4]["columns"] == []


def test_html_render_negative_red_and_footnotes():
    from etl_staging_spark.reports.html import render_report_html

    lines = [
        {"id": "line~a", "name": "Revenue", "level": 0,
         "columns": [{"no_format": 100.0}]},
        {"id": "line~b", "name": "Costs", "level": 1, "parent_id": "line~a",
         "columns": [{"no_format": -40.5}]},
    ]
    html = render_report_html(
        "P&L", ["Balance"], lines,
        footnotes={"line~b": "includes accrual"}, print_mode=True)
    assert "P&amp;L" in html
    assert '<td class="number">100.00</td>' in html
    assert '<td class="number color-red">-40.50</td>' in html
    # print-mode footnote: superscript on the line + rendered list
    assert '<sup class="footnote">1</sup>' in html
    assert '<li value="1">includes accrual</li>' in html
    # screen mode: no footnote artifacts
    html2 = render_report_html("P&L", ["Balance"], lines,
                               footnotes={"line~b": "x"}, print_mode=False)
    assert "<sup" not in html2 and "<ol" not in html2


def test_html_column_group_header_and_indent():
    from etl_staging_spark.reports.html import render_report_html

    html = render_report_html(
        "GL", ["Debit", "Credit", "Debit", "Credit"],
        [{"id": "line~x", "name": "400000 Sales", "level": 2,
          "columns": [{"no_format": 1.0}, {"no_format": 2.0},
                      {"no_format": 3.0}, {"no_format": 4.0}]}],
        column_groups=[("1997", 2), ("1996", 2)],
    )
    assert '<th colspan="2">1997</th><th colspan="2">1996</th>' in html
    assert 'padding-left:32px' in html


def test_pdf_export_uses_builtin_writer_without_backend(tmp_path):
    """r13: export_pdf no longer raises in a backend-free container —
    the built-in dependency-free PDF 1.4 writer (`reports/pdf.py`) is
    the fallback, so the S5 export surface is complete without
    wkhtmltopdf/weasyprint. HTML-only kwargs are accepted and ignored
    by the writer (the weasyprint path would consume them)."""
    import os

    from etl_staging_spark.reports.html import export_pdf

    target = str(tmp_path / "report.pdf")
    out = export_pdf(target, "R", ["V"],
                     [{"id": "l", "name": "n", "columns": [{"no_format": 1.0}]}],
                     figure_type="monetary")
    assert out == target and os.path.exists(target)
    pdf = open(target, "rb").read()
    assert pdf.startswith(b"%PDF-1.4") and b"%%EOF" in pdf
    assert not os.path.exists(target + ".html")  # no side-file fallback

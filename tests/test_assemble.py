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

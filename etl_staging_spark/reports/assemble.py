"""Driver-side line-tree assembly: hierarchical sort (O3) and recursive
prefix regrouping (O4).

These operate on ASSEMBLED report lines — O(report lines), not O(data)
— so they are plain Python by design, like the reference
(`account_report.py:3436-3542` sort, `:3934-4077` prefix groups). The
data-sized work happened upstream in the engines.

Line dicts: ``{"id": "markup~model~value", "parent_id": str|None,
"columns": [{"no_format": value}, ...]}``.
"""

from __future__ import annotations

import datetime
import decimal
from collections import defaultdict
from functools import cmp_to_key

_TYPE_SEQ = {
    type(None): 0,
    bool: 1,
    float: 2,
    int: 2,
    str: 3,
    datetime.date: 4,
    datetime.datetime: 5,
}


def get_markup(line_id: str | None) -> str:
    return (line_id or "").split("~")[0]


def sort_lines(lines: list[dict], order_column: int) -> list[dict]:
    """Stable hierarchical sort by the 1-indexed ``order_column``
    (negative = descending). Total/load_more lines stay pinned to the
    bottom of their parent; mixed-typed values order by type class
    (None < bool < number < str < date < datetime)."""
    if not order_column:
        return lines
    descending = order_column < 0
    column_index = abs(order_column) - 1

    def at_bottom(line: dict) -> bool:
        return get_markup(line.get("id")) in ("total", "load_more")

    def compare(a: dict, b: dict) -> int:
        a_total, b_total = at_bottom(a), at_bottom(b)
        if a_total:
            if b_total:
                return 0
            return -1 if descending else 1
        if b_total:
            return 1 if descending else -1
        a_val = a["columns"][column_index].get("no_format")
        b_val = b["columns"][column_index].get("no_format")
        ta, tb = _TYPE_SEQ[type(a_val)], _TYPE_SEQ[type(b_val)]
        if ta == tb:
            return 0 if a_val == b_val else (1 if a_val > b_val else -1)
        return ta - tb

    comp_key = cmp_to_key(compare)
    tree: dict[str | None, list[dict]] = defaultdict(list)
    non_total_parents: set[str | None] = set()
    for line in lines:
        parent = line.get("parent_id") or None
        tree[parent].append(line)
        if get_markup(line["id"]) != "total":
            non_total_parents.add(parent)

    if None not in tree and len(non_total_parents) == 1:
        # sorting the children of a single unfolded line
        root = next(iter(non_total_parents))
    else:
        root = None

    out: list[dict] = []

    def merge(line: dict) -> None:
        out.append(line)
        for child in sorted(tree[line["id"]], key=comp_key, reverse=descending):
            merge(child)

    for line in sorted(tree[root], key=comp_key, reverse=descending):
        merge(line)
    return out


def growth_comparison_data(
    value1, value2, green_on_positive: bool = True
) -> dict:
    """`_compute_growth_comparison_column` (`account_report.py:4445-4471`):
    the extra %-growth cell between the current and the compared period.
    'n/a' when the compared value rounds to zero at 0.1 precision; the
    color flips on negative compared figures (sales going -1000 -> 1000
    is growth, even though the raw % is negative)."""
    if round(value2, 1) == 0:
        return {"name": "n/a", "class": "number"}
    res = round((value1 - value2) / value2 * 100, 1)
    if round(res, 1) == 0:
        return {"name": "0.0%", "class": "number"}
    if (res > 0) != (green_on_positive and value2 > 0):
        return {"name": f"{res}%", "class": "number color-red"}
    return {"name": f"{res}%", "class": "number color-green"}


def add_growth_comparison(lines: list[dict], green_on_positive: bool = True) -> None:
    """Attach ``growth_comparison_data`` to each line from its first two
    columns (current vs compared column group) — `account_report.py:
    1802-1822`. Layout lines with no values get an empty cell."""
    for line in lines:
        v1 = line["columns"][0].get("no_format") if line["columns"] else None
        v2 = line["columns"][1].get("no_format") if len(line["columns"]) > 1 else None
        if not v1 and not v2:
            line["growth_comparison_data"] = {"name": "", "class": ""}
        else:
            line["growth_comparison_data"] = growth_comparison_data(
                v1 or 0.0, v2 or 0.0, green_on_positive
            )


def _children_index(lines: list[dict]) -> dict[str | None, list[str]]:
    children: dict[str | None, list[str]] = defaultdict(list)
    for line in lines:
        children[line.get("parent_id")].append(line["id"])
    return children


def hide_if_zero(lines: list[dict], flagged_ids: set[str]) -> list[dict]:
    """`account_report.py:1824-1852`: a flagged line hides when its own
    columns AND every descendant's columns are all zero/empty; hiding a
    line hides its children too."""
    by_id = {line["id"]: line for line in lines}
    children = _children_index(lines)

    def subtree(root: str) -> list[str]:
        out, stack = [], [root]
        while stack:
            cur = stack.pop()
            out.append(cur)
            stack.extend(children.get(cur, []))
        return out

    hidden: set[str] = set()
    for lid in flagged_ids:
        if lid not in by_id:
            continue
        tree = subtree(lid)
        if all(
            not c.get("no_format")
            for node in tree
            for c in by_id[node]["columns"]
        ):
            hidden.update(tree)
    return [
        line
        for line in lines
        if line["id"] not in hidden and line.get("parent_id") not in hidden
    ]


def add_totals_below_sections(lines: list[dict]) -> list[dict]:
    """`_add_totals_below_sections` (`account_report.py:3824-3863`):
    every section (a line that parents other lines, or an unfoldable
    line with values) gets a 'Total <name>' copy of itself appended
    after its last descendant, stack-ordered so nested sections close
    inner-first."""
    by_id = {line["id"]: line for line in lines}
    parents = {line.get("parent_id") for line in lines if line.get("parent_id")}
    needing = {
        line["id"]
        for line in lines
        if (line["id"] in parents or line.get("unfoldable"))
        and get_markup(line["id"]) != "total"
    }

    def ancestors(line: dict) -> set[str]:
        seen: set[str] = set()
        parent = line.get("parent_id")
        while parent is not None and parent in by_id and parent not in seen:
            seen.add(parent)
            parent = by_id[parent].get("parent_id")
        return seen

    out: list[dict] = []
    stack: list[dict] = []
    for line in lines:
        anc = ancestors(line)
        while stack and stack[-1]["parent_id"] not in anc:
            out.append(stack.pop())
        out.append(line)
        if line["id"] in needing and any(
            c.get("no_format") is not None for c in line["columns"]
        ):
            stack.append(
                {
                    **line,
                    "id": f"total~{line['id']}",
                    "name": f"Total {line['name']}",
                    "parent_id": line["id"],
                    "level": line.get("level", 0) + 1,
                    "unfoldable": False,
                }
            )
    while stack:
        out.append(stack.pop())
    return out


def create_hierarchy(
    account_lines: list[dict],
    groups: list[dict],
    no_group_name: str = "(No Group)",
) -> list[dict]:
    """Insert account.group rollup lines above account lines — the
    driver-side port of `_create_hierarchy` (`account_report.py:845-993`),
    O(report lines).

    ``account_lines``: [{'code', 'name', 'columns': [{'no_format': v}]}]
    in any order. ``groups``: [{'prefix', 'name', 'parent': prefix|None}]
    — the account.group table; an account belongs to the group with the
    LONGEST prefix of its code, and group totals roll up the parent
    chain. Accounts matching no group go under a '(No Group)' node,
    rendered last at the root, like the reference.

    Returns the full line list in tree order: each group line
    (id ``group~<prefix>``, level, parent_id, rolled-up columns)
    followed by its child groups and member accounts, interleaved in
    code order."""
    by_prefix = {g["prefix"]: dict(g) for g in groups}
    n_cols = len(account_lines[0]["columns"]) if account_lines else 0
    for g in by_prefix.values():
        g.setdefault("parent", None)
        g["totals"] = [0.0] * n_cols
        g["accounts"] = []

    children: dict[str | None, list[str]] = defaultdict(list)
    roots: list[str] = []
    for prefix, g in sorted(by_prefix.items()):
        if g["parent"] is not None:
            children[g["parent"]].append(prefix)
        else:
            roots.append(prefix)

    no_group: list[dict] = []
    no_group_totals = [0.0] * n_cols
    for line in sorted(account_lines, key=lambda l: l["code"]):
        best = None
        for prefix in by_prefix:
            if line["code"].startswith(prefix) and (
                best is None or len(prefix) > len(best)
            ):
                best = prefix
        if best is None:
            no_group.append(line)
            no_group_totals = [
                t + c.get("no_format", 0.0)
                for t, c in zip(no_group_totals, line["columns"])
            ]
            continue
        by_prefix[best]["accounts"].append(line)
        # roll the account's columns up the parent chain
        walk = best
        while walk is not None:
            g = by_prefix[walk]
            g["totals"] = [
                t + c.get("no_format", 0.0)
                for t, c in zip(g["totals"], line["columns"])
            ]
            walk = g["parent"]

    out: list[dict] = []

    def render(prefix: str, level: int, parent_id: str | None) -> None:
        g = by_prefix[prefix]
        gid = f"group~{prefix}"
        out.append(
            {
                "id": gid,
                "name": g["name"],
                "level": level,
                "parent_id": parent_id,
                "columns": [{"no_format": t} for t in g["totals"]],
            }
        )
        # interleave child groups and member accounts in code order: a
        # child group renders before accounts sorting after its prefix
        kids = [(p, "g") for p in children.get(prefix, [])] + [
            (a["code"], a) for a in g["accounts"]
        ]
        for key, item in sorted(kids, key=lambda kv: kv[0]):
            if item == "g":
                render(key, level + 1, gid)
            else:
                out.append(
                    {**item, "id": f"account~{item['code']}", "level": level + 1, "parent_id": gid}
                )

    for prefix in roots:
        render(prefix, 0, None)
    if no_group:
        out.append(
            {
                "id": "group~",
                "name": no_group_name,
                "level": 0,
                "parent_id": None,
                "columns": [{"no_format": t} for t in no_group_totals],
            }
        )
        for line in no_group:
            out.append(
                {**line, "id": f"account~{line['code']}", "level": 1, "parent_id": "group~"}
            )
    return out


def prefix_groups(
    names: list[str], threshold: int, prefix_len: int = 1
) -> dict[str, list[str] | dict]:
    """O4: recursively bucket a too-long sibling list by name prefix —
    groups still over the threshold regroup one character deeper
    (`account_report.py:3934-4077`). Returns nested
    {prefix: sub-dict-or-leaf-list}."""
    if len(names) <= threshold:
        return {"": sorted(names)} if prefix_len == 1 else {}
    buckets: dict[str, list[str]] = defaultdict(list)
    for name in names:
        buckets[name[:prefix_len].upper()].append(name)
    out: dict[str, list[str] | dict] = {}
    for prefix, members in sorted(buckets.items()):
        if len(members) > threshold and any(len(n) > prefix_len for n in members):
            out[prefix] = prefix_groups(members, threshold, prefix_len + 1)
        else:
            out[prefix] = sorted(members)
    return out


# ---------------------------------------------------------------------------
# Footnotes + display formatting (`account_report.py:41-61` footnote
# manager, `:3770-3783` print-mode numbering, `:4102-4138` format_value).
# Driver-side over assembled lines, like the reference.
# ---------------------------------------------------------------------------


def attach_footnotes(lines: list[dict], footnotes: dict[str, str]) -> list[dict]:
    """Print-mode footnote numbering: walk the VISIBLE lines in render
    order, number each line that has a footnote (1-based, in order of
    appearance), set ``line['footnote']`` to that number, and return the
    render list ``[{'number': n, 'line': id, 'text': ...}]``. Footnotes
    keyed on lines not present (filtered/hidden) are skipped — numbering
    follows visibility, exactly like the reference's print mode."""
    to_render: list[dict] = []
    number = 0
    for line in lines:
        text = footnotes.get(str(line.get("id")))
        if text is not None:
            number += 1
            line["footnote"] = str(number)
            to_render.append({"number": number, "line": str(line["id"]), "text": text})
    return to_render


ROUNDING_UNITS = {"units": 1, "thousands": 1_000, "millions": 1_000_000}


def format_value(value, figure_type: str | None = None, digits: int = 1,
                 blank_if_zero: bool = True,
                 rounding_unit: str = "units") -> str:
    """`format_value` port: display formatting for assembled cells.

    - figure_type 'none' passes through; None value renders '';
    - 'monetary' uses 2 digits and divides by the rounding unit
      (units / thousands / millions display toggle);
    - 'integer' uses 0 digits; 'percentage' appends '%';
    - zeros render '' when ``blank_if_zero`` else without a sign
      (never '-0.0');
    - thousands separators, fixed decimals otherwise;
    - a NON-NUMERIC value (date, label, reference string) passes
      through as its string — display formatting must degrade, not
      raise, when a raw cell reaches a numeric figure_type (possible
      since r13: apply_colspans keeps no_format-only cells, so string
      cells survive to the formatter instead of being merged away).
      Decimal (Spark's decimal columns collect as decimal.Decimal)
      counts as numeric."""
    if figure_type == "none":
        return value
    if value is None:
        return ""
    if isinstance(value, decimal.Decimal):
        value = float(value)
    elif not isinstance(value, (int, float)) or isinstance(value, bool):
        return str(value)
    if figure_type == "monetary":
        digits = 2
        value = value / ROUNDING_UNITS[rounding_unit]
    elif figure_type == "integer":
        digits = 0
    elif figure_type in ("date", "datetime"):
        return str(value)
    if round(abs(float(value)), digits) == 0:
        if blank_if_zero:
            return ""
        value = abs(value)  # never render -0.0
    formatted = f"{float(value):,.{digits}f}"
    if figure_type == "percentage":
        return f"{formatted}%"
    return formatted

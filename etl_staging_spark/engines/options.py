"""The options pipeline: runtime query spec for the engine layer.

Ports the reference's options dict + date-scope resolution
(`account_report.py:1389-1456` pipeline, `:606-659` date scopes,
`:1193-1282` column groups) in plain Python — this is query
*construction*, not data processing, so it stays driver-side.

An options dict looks like::

    {
        "date": {"mode": "range", "date_from": "1997-01-01",
                 "date_to": "1997-12-31"},
        "comparison": {"periods": [ ...same shape as date... ]},
        "column_groups": {key: {"forced_options": {...}}},
    }

Fiscal years are calendar years (the reference delegates to the
company's fiscal-year settings; the fixtures use Dec 31 year-end).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

DATE_SCOPES = (
    "strict_range",
    "normal",
    "from_beginning",
    "to_beginning_of_period",
    "from_fiscalyear",
    "to_beginning_of_fiscalyear",
)


def make_options(date_from: str, date_to: str, mode: str = "range") -> dict:
    return {"date": {"mode": mode, "date_from": date_from, "date_to": date_to}}


def _parse(d: str) -> dt.date:
    return dt.date.fromisoformat(d)


def date_bounds(options: dict, date_scope: str) -> tuple[str | None, str, bool]:
    """(date_from, date_to, allow_include_initial_balance) — the port of
    `_get_date_bounds_info` (`account_report.py:622-659`), fiscal year =
    calendar year."""
    date_to = options["date"]["date_to"]
    date_from = (
        options["date"]["date_from"] if options["date"]["mode"] == "range" else None
    )
    allow_initial = False

    if date_scope == "strict_range":
        pass
    elif date_scope == "normal":
        allow_initial = True
    elif date_scope == "from_beginning":
        date_from = None
    elif date_scope == "to_beginning_of_period":
        eve = _parse(date_from or date_to) - dt.timedelta(days=1)
        date_to = eve.isoformat()
        date_from = None
    elif date_scope == "from_fiscalyear":
        date_from = _parse(date_to).replace(month=1, day=1).isoformat()
    elif date_scope == "to_beginning_of_fiscalyear":
        eve = _parse(date_to).replace(month=1, day=1) - dt.timedelta(days=1)
        date_to = eve.isoformat()
        date_from = None
    else:
        raise ValueError(f"unknown date_scope {date_scope!r}")
    return date_from, date_to, allow_initial


def date_scope_filter(options: dict, date_scope: str, date_col: str = "date") -> Column:
    """The Spark predicate for a date scope — port of
    `_get_options_date_domain` (`account_report.py:606-620`). Under
    'normal', rows on balance-sheet accounts (include_initial_balance)
    are kept even before date_from — that is how opening balances flow
    into 'normal'-scoped expressions."""
    from .ledger import is_balance_sheet

    date_from, date_to, allow_initial = date_bounds(options, date_scope)
    # end-of-day bound: the ledger date is a timestamp column
    pred = F.col(date_col) <= f"{date_to} 23:59:59"
    if date_from:
        lower = F.col(date_col) >= date_from
        if allow_initial:
            lower = lower | is_balance_sheet()
        pred = pred & lower
    return pred


def o_date_scope_sql(options: dict, date_scope: str, date_col: str = "date") -> str:
    """DuckDB twin of :func:`date_scope_filter` (led CTE columns)."""
    date_from, date_to, allow_initial = date_bounds(options, date_scope)
    parts = [f"{date_col} <= TIMESTAMP '{date_to} 23:59:59'"]
    if date_from:
        lower = f"{date_col} >= TIMESTAMP '{date_from}'"
        if allow_initial:
            lower = f"({lower} OR CAST(substr(account_code, 1, 1) AS INT) <= 5)"
        parts.append(lower)
    return " AND ".join(parts)


def build_column_groups(options: dict) -> dict[str, dict]:
    """Column groups = the cross product of (current period + comparison
    periods) — `account_report.py:1193-1282`. Each group carries its own
    forced date options; engines run once per group and the results are
    unioned keyed by column_group_key (the A8/U1 pattern)."""
    periods = [options["date"]] + options.get("comparison", {}).get("periods", [])
    groups: dict[str, dict] = {}
    for i, period in enumerate(periods):
        groups[f"cg{i}"] = {"forced_options": {"date": period}}
    return groups


def group_options(options: dict, group: dict) -> dict:
    """Overlay one column group's forced options on the base options."""
    return {**options, **group.get("forced_options", {})}

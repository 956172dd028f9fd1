"""E6 extension — ``cross_report``: aggregation terms that reference
ANOTHER report's expressions.

Reference semantics (`account_reports/models/account_report.py:2121-2125`
expansion, `:2268` forced scope, `:2321-2343` foreign eval dict,
`:2443` bounds exclusion):

- an aggregation expression whose subformula is ``cross_report`` may
  reference line codes belonging to other report definitions;
- before the fixpoint runs, the foreign expressions are computed under
  the REFERENCING expression's ``date_scope`` (the forced scope) — the
  same foreign line yields different values under different scopes;
- foreign aggregation lines expand recursively under the same forced
  scope; an expression cannot have both bounds and ``cross_report``.

Spark shape: every domain line needed under one date scope (local or
foreign) batches into ONE aggregate over the scoped ledger — a column
per line, so N referenced lines cost one scan per distinct scope; the
fixpoint stays driver-side over the collected scalars (O(lines)).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..domain import compile_domain
from . import aggregation
from .options import date_scope_filter

CROSS_REPORT = "cross_report"


@dataclass(frozen=True)
class Line:
    """One report expression: (code, label, engine, formula, subformula,
    date_scope) — the `account.report.expression` quintuple."""

    code: str
    engine: str  # 'domain' | 'aggregation'
    formula: object  # domain list (domain) or formula string (aggregation)
    label: str = "balance"
    subformula: str | None = None
    date_scope: str = "strict_range"

    @property
    def key(self) -> str:
        return f"{self.code}.{self.label}"


def _terms(formula: str) -> list[str]:
    return [
        t
        for t in aggregation.TERM_SPLIT_RE.split(formula)
        if t and not aggregation._is_float(t)
    ]


def evaluate_report(
    led: DataFrame,
    options: dict,
    report: list[Line],
    registry: dict[str, Line] | None = None,
    extra_base_values: dict[str, float] | None = None,
) -> dict[str, float]:
    """Evaluate a report's lines, expanding ``cross_report`` terms from
    ``registry`` (the other reports' lines keyed 'CODE.label') under the
    referencing expression's date scope. ``extra_base_values`` injects
    already-known scalars (the custom-engine hook, e.g. the executive
    summary's NDays term). Returns every computed value — local lines
    under their own scopes plus the foreign expansions."""
    registry = registry or {}
    extra = dict(extra_base_values or {})
    local = {ln.key: ln for ln in report}

    # scope -> {result key -> filter Column}; local domain lines run
    # under their own scope, foreign ones under the forced scope
    scope_batches: dict[str, dict[str, object]] = {}
    formulas: dict[str, str] = {}
    subformulas: dict[str, str] = {}
    forced_scope_of: dict[str, str] = {}

    def add_domain(key: str, ln: Line, scope: str) -> None:
        scope_batches.setdefault(scope, {})[key] = compile_domain(ln.formula)

    def expand_foreign(term_key: str, forced_scope: str) -> None:
        if term_key in local or term_key in extra:
            return
        prev = forced_scope_of.get(term_key)
        if prev is not None:
            if prev != forced_scope:
                raise ValueError(
                    f"{term_key} referenced under two forced scopes "
                    f"({prev!r}, {forced_scope!r}); split the expression"
                )
            return
        ln = registry.get(term_key)
        if ln is None:
            raise KeyError(f"cross_report term {term_key!r} not in registry")
        forced_scope_of[term_key] = forced_scope
        if ln.engine == "domain":
            add_domain(term_key, ln, forced_scope)
        elif ln.engine == "aggregation":
            if ln.subformula and ln.subformula != CROSS_REPORT:
                # reference :2443: bounded expressions cannot be pulled
                # across reports (the forced scope would ignore bounds)
                raise ValueError(f"cross_report target {term_key!r} has bounds")
            formulas[term_key] = ln.formula
            for t in _terms(ln.formula):
                expand_foreign(t, forced_scope)
        else:
            raise ValueError(f"unsupported foreign engine {ln.engine!r}")

    for ln in report:
        if ln.engine == "domain":
            add_domain(ln.key, ln, ln.date_scope)
        elif ln.engine == "aggregation":
            formulas[ln.key] = ln.formula
            if ln.subformula == CROSS_REPORT:
                for t in _terms(ln.formula):
                    if t not in local:
                        expand_foreign(t, ln.date_scope)
            elif ln.subformula:
                subformulas[ln.key] = ln.subformula
        else:
            raise ValueError(f"unsupported engine {ln.engine!r}")

    base_values: dict[str, float] = dict(extra)
    if scope_batches:
        # ONE scan for every domain line across every date scope: each
        # line's column gates on (its scope's date predicate AND its
        # domain), and the scan-level filter is the OR of all scope
        # predicates — the reference's multi-period UNION ALL fused into
        # a single conditional aggregate (SURVEY §4), so N scopes cost
        # one pass over the fact at any scale.
        aliases: dict[str, tuple[str, object]] = {}
        scope_preds = {
            scope: date_scope_filter(options, scope) for scope in scope_batches
        }
        for scope, cols in sorted(scope_batches.items()):
            for key in sorted(cols):
                aliases[f"c{len(aliases)}"] = (key, scope_preds[scope] & cols[key])
        scan_pred = None
        for pred in scope_preds.values():
            scan_pred = pred if scan_pred is None else (scan_pred | pred)
        row = led.where(scan_pred).agg(
            *[
                F.coalesce(F.sum(F.when(cond, F.col("conv"))), F.lit(0))
                .cast("double")
                .alias(alias)
                for alias, (_key, cond) in aliases.items()
            ]
        ).first()
        for alias, (key, _cond) in aliases.items():
            base_values[key] = row[alias]

    results = aggregation.evaluate(base_values, formulas, subformulas)
    return {**base_values, **results}

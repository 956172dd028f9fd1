"""Odoo-domain → Spark Column predicate compiler (operator F1).

The reference expresses every filter as an Odoo *domain*: a list in
prefix notation with implicit AND, e.g.::

    ['|', ('account_type', '=', 'asset_receivable'),
          ('account_type', '=', 'liability_payable'),
     ('date', '<=', '2017-12-31'),
     ('parent_state', '=', 'posted')]

which the ORM compiles to SQL WHERE via ``_where_calc(...).get_sql()``
(reference `account_reports/models/account_report.py:1496-1501`,
`osv/expression.py` semantics). Here the same IR compiles to a
``pyspark.sql.Column`` tree, so Catalyst sees a plain predicate it can
push into the parquet scan — the manual "compose filters before the
scan" optimization of the reference (SURVEY.md §4) becomes free.

Supported operators (the set observed across the reference):
``= != > >= < <= in not in like ilike not like not ilike =like =ilike``
plus the prefix connectives ``& | !``. Field paths with dots
(``'partner_id.country_code'``) resolve as struct/column paths.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

AND, OR, NOT = "&", "|", "!"
_CONNECTIVES = {AND: 2, OR: 2, NOT: 1}

TRUE_LEAF = (1, "=", 1)
FALSE_LEAF = (0, "=", 1)


def _escape_like(value: str) -> str:
    """Escape SQL LIKE wildcards for substring-style (i)like."""
    return value.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")


def _leaf_to_column(leaf: Sequence) -> Column:
    field, op, value = leaf
    if leaf == TRUE_LEAF or (field, op, value) == TRUE_LEAF:
        return F.lit(True)
    if (field, op, value) == FALSE_LEAF:
        return F.lit(False)
    col = F.col(field)
    if op == "=":
        return col.isNull() if value is None else (col == value)
    if op in ("!=", "<>"):
        return col.isNotNull() if value is None else (col != value) | col.isNull()
    if op == ">":
        return col > value
    if op == ">=":
        return col >= value
    if op == "<":
        return col < value
    if op == "<=":
        return col <= value
    if op == "in":
        vals = list(value)
        if None in vals:
            non_null = [v for v in vals if v is not None]
            return col.isin(non_null) | col.isNull() if non_null else col.isNull()
        return col.isin(vals)
    if op == "not in":
        vals = [v for v in value if v is not None]
        cond = ~col.isin(vals) if vals else F.lit(True)
        # Odoo's NOT IN keeps NULL rows (SQL would drop them).
        return cond | col.isNull() if None not in value else cond & col.isNotNull()
    if op == "like":
        return col.like(f"%{_escape_like(value)}%")
    if op == "not like":
        return ~col.like(f"%{_escape_like(value)}%") | col.isNull()
    if op == "ilike":
        return F.lower(col).like(f"%{_escape_like(value).lower()}%")
    if op == "not ilike":
        return ~F.lower(col).like(f"%{_escape_like(value).lower()}%") | col.isNull()
    if op == "=like":
        return col.like(value)
    if op == "=ilike":
        return F.lower(col).like(value.lower())
    if op == "not =like":
        return ~col.like(value) | col.isNull()
    if op == "not =ilike":
        return ~F.lower(col).like(value.lower()) | col.isNull()
    raise ValueError(f"unsupported domain operator {op!r} in {leaf!r}")


def normalize(domain: Sequence) -> list:
    """Insert the implicit leading '&'s so the domain is a well-formed
    prefix expression (same normalization as osv.expression)."""
    result: list = []
    expected = 1
    for token in domain:
        if expected == 0:
            result.insert(0, AND)
            expected = 1
        if isinstance(token, str) and token in _CONNECTIVES:
            result.append(token)
            expected += _CONNECTIVES[token] - 1
        else:
            result.append(tuple(token))
            expected -= 1
    if expected > 0:
        raise ValueError(f"malformed domain {domain!r}: missing {expected} operand(s)")
    return result


# Leaf-operator negations, as in osv.expression.TERM_OPERATORS_NEGATION:
# '!' distributes into leaves instead of wrapping the compiled Column in
# a SQL NOT. The distinction matters on NULLs — Odoo's NOT(a = 0) is
# (a != 0), which KEEPS NULL rows, while SQL NOT(a = 0) drops them.
_NEGATED_OP = {
    "=": "!=", "!=": "=", "<>": "=",
    "<": ">=", ">=": "<", ">": "<=", "<=": ">",
    "in": "not in", "not in": "in",
    "like": "not like", "not like": "like",
    "ilike": "not ilike", "not ilike": "ilike",
    "=like": "not =like", "=ilike": "not =ilike",
}


def distribute_not(tokens: list) -> list:
    """Push every '!' down to the leaves (De Morgan on '&'/'|', operator
    negation on leaves) — the port of osv.expression.distribute_not."""
    out: list = []

    def walk(pos: int, negate: bool) -> int:
        token = tokens[pos]
        if isinstance(token, str) and token in _CONNECTIVES:
            if token == NOT:
                return walk(pos + 1, not negate)
            out.append((OR if token == AND else AND) if negate else token)
            mid = walk(pos + 1, negate)
            return walk(mid, negate)
        if negate:
            # osv.expression.distribute_not special-cases the constant
            # leaves: NOT TRUE_LEAF is FALSE_LEAF (and vice versa), never
            # an operator flip — (1, '!=', 1) would hit F.col(1).
            if tuple(token) == TRUE_LEAF:
                out.append(FALSE_LEAF)
                return pos + 1
            if tuple(token) == FALSE_LEAF:
                out.append(TRUE_LEAF)
                return pos + 1
            field, op, value = token
            neg = _NEGATED_OP.get(op)
            if neg is None:
                raise ValueError(f"cannot negate operator {op!r} in {token!r}")
            out.append((field, neg, value))
        else:
            out.append(token)
        return pos + 1

    nxt = walk(0, False)
    if nxt != len(tokens):
        raise ValueError(f"trailing tokens after NOT distribution: {tokens!r}")
    return out


def expand_hierarchy_leaves(tokens: list, hierarchies: dict | None) -> list:
    """Rewrite ``child_of`` / ``parent_of`` leaves to plain ``in``
    membership over the (bounded) subtree — the ORM's id-expansion
    strategy for `child_of` (osv.expression; reference usage
    `account_analytic_report.py:60`). Runs BEFORE NOT distribution so a
    negated hierarchy leaf falls out as ``not in`` naturally.

    ``hierarchies`` maps field name → :class:`~.operators.hierarchy
    .Hierarchy`. The expansion keeps the predicate a literal IN list, so
    it pushes into the fact scan; the hierarchy dim itself is never
    joined for the filter."""
    out = []
    for token in tokens:
        if isinstance(token, str):
            out.append(token)
            continue
        field, op, value = token
        if op in ("child_of", "parent_of"):
            h = (hierarchies or {}).get(field)
            if h is None:
                raise ValueError(
                    f"domain leaf {token!r} needs a Hierarchy for field "
                    f"{field!r} (pass hierarchies={{...}})"
                )
            roots = value if isinstance(value, (list, tuple, set)) else [value]
            ids: list = []
            expand = h.descendants if op == "child_of" else h.ancestors
            for r in roots:
                ids.extend(expand(r))
            out.append((field, "in", sorted(set(ids), key=repr)))
        else:
            out.append(token)
    return out


def compile_domain(domain: Sequence | None, hierarchies: dict | None = None) -> Column:
    """Compile a domain to one Spark Column predicate.

    ``hierarchies``: optional {field: Hierarchy} enabling the
    ``child_of`` / ``parent_of`` operators (expanded to pushable IN
    lists; see :func:`expand_hierarchy_leaves`)."""
    if not domain:
        return F.lit(True)
    tokens = distribute_not(
        expand_hierarchy_leaves(normalize(domain), hierarchies)
    )

    def parse(pos: int) -> tuple[Column, int]:
        token = tokens[pos]
        if isinstance(token, str) and token in _CONNECTIVES:
            left, mid = parse(pos + 1)
            right, nxt = parse(mid)
            return (left & right, nxt) if token == AND else (left | right, nxt)
        return _leaf_to_column(token), pos + 1

    col, nxt = parse(0)
    if nxt != len(tokens):
        raise ValueError(f"trailing tokens in domain {domain!r}")
    return col


def _sql_literal(value) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    raise ValueError(f"cannot render SQL literal for {value!r}")


def _leaf_to_sql(leaf: Sequence) -> str:
    """SQL-string twin of :func:`_leaf_to_column` (same NULL semantics);
    the Spark-SQL analog of the ORM's `_where_calc(...).get_sql()`.
    Only the operator subset needed by hot paths is implemented — the
    Column backend stays the reference implementation."""
    field, op, value = leaf
    if (field, op, value) == TRUE_LEAF:
        return "TRUE"
    if (field, op, value) == FALSE_LEAF:
        return "FALSE"
    if op == "=":
        return f"{field} IS NULL" if value is None else f"{field} = {_sql_literal(value)}"
    if op in ("!=", "<>"):
        if value is None:
            return f"{field} IS NOT NULL"
        return f"({field} != {_sql_literal(value)} OR {field} IS NULL)"
    if op in (">", ">=", "<", "<="):
        return f"{field} {op} {_sql_literal(value)}"
    if op == "in":
        vals = list(value)
        non_null = [v for v in vals if v is not None]
        items = ", ".join(_sql_literal(v) for v in non_null)
        base = f"{field} IN ({items})" if non_null else "FALSE"
        return f"({base} OR {field} IS NULL)" if None in vals else base
    if op == "not in":
        vals = [v for v in value if v is not None]
        items = ", ".join(_sql_literal(v) for v in vals)
        base = f"{field} NOT IN ({items})" if vals else "TRUE"
        if None in value:
            return f"({base} AND {field} IS NOT NULL)"
        return f"({base} OR {field} IS NULL)"
    raise ValueError(f"unsupported operator {op!r} for SQL-string domain backend")


def domain_to_sql(domain: Sequence | None, hierarchies: dict | None = None) -> str:
    """Compile a domain to ONE Spark-SQL boolean expression string.

    Same semantics as :func:`compile_domain`, emitted as text so hot
    builders can assemble an entire projection in a single
    ``selectExpr`` — one driver→JVM roundtrip instead of one per
    expression node (the Column API's build cost is measurable when a
    report rebuilds its frame per invocation)."""
    if not domain:
        return "TRUE"
    tokens = distribute_not(expand_hierarchy_leaves(normalize(domain), hierarchies))

    def parse(pos: int) -> tuple[str, int]:
        token = tokens[pos]
        if isinstance(token, str) and token in _CONNECTIVES:
            left, mid = parse(pos + 1)
            right, nxt = parse(mid)
            glue = "AND" if token == AND else "OR"
            return f"({left} {glue} {right})", nxt
        return _leaf_to_sql(token), pos + 1

    sql, nxt = parse(0)
    if nxt != len(tokens):
        raise ValueError(f"trailing tokens in domain {domain!r}")
    return sql


def and_join(*domains: Sequence | None) -> Column:
    """AND-combine several domains (the reference's filter pipeline is a
    conjunction of per-filter domains, `account_report.py:1458-1480`)."""
    col = F.lit(True)
    for d in domains:
        if d:
            col = col & compile_domain(d)
    return col

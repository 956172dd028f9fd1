"""Remaining §2 operators: F2 composite report filter, F5 search-bar
ilike, M4 serial-ledger rebuild.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..domain import and_join
from ..engines.ledger import O_LEDGER
from ..tables import load, respread_narrow
from .registry import dsum, o_dsum, query


# ---------------------------------------------------------------------------
# F2: composite report filter — the conjunction of independent filter
# domains (journal/date/partner/posted pipeline,
# account_report.py:1458-1480) composed via and_join.
# ---------------------------------------------------------------------------


@query(
    "f2_composite_filter",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n, {o_dsum('o_totalprice')} AS amount
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <= TIMESTAMP '1997-12-31 23:59:59'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice > 50000
    GROUP BY o_orderstatus
    """,
)
def f2_composite_filter(spark, sf_dir):
    """Each report filter contributes its own domain; the query applies
    their conjunction — one pushed-down predicate."""
    date_domain = [
        ("o_orderdate", ">=", "1996-01-01"),
        ("o_orderdate", "<=", "1997-12-31 23:59:59"),
    ]
    priority_domain = [("o_orderpriority", "in", ["1-URGENT", "2-HIGH"])]
    amount_domain = [("o_totalprice", ">", 50000)]
    o = load(spark, sf_dir, "orders").where(
        and_join(date_domain, priority_domain, amount_domain)
    )
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("amount")
    )


# ---------------------------------------------------------------------------
# F5: search-bar ilike filter pushed into the sums query
# (account_general_ledger.py:233-234).
# ---------------------------------------------------------------------------


@query(
    "f5_searchbar",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n, {o_dsum('p_retailprice')} AS total_price
    FROM part
    WHERE lower(p_name) LIKE '%red%'
    GROUP BY p_brand
    """,
)
def f5_searchbar(spark, sf_dir):
    # 'red' occurs in the synthetic part names ('red widget', ...), so the
    # ilike path is actually exercised (the previous 'green' matched 0 rows,
    # making the hash check vacuous).
    dom = [("p_name", "ilike", "red")]
    p = load(spark, sf_dir, "part").where(and_join(dom))
    return p.groupBy("p_brand").agg(
        F.count("*").alias("n"), dsum("p_retailprice").alias("total_price")
    )


# ---------------------------------------------------------------------------
# M4: serial-ledger correction chain — the full per-location rebuild
# (etl_sale/models/serial.py:708-1026, action_correct_outs*/
# action_correct_slno_*): net each serial's movements per location,
# backfill a synthetic 'Opening Stock' IN (dated at the first movement)
# where the net goes negative (the reference's missing-IN creation),
# drop duplicate movements (its unlink of degenerate rows), and keep
# the last-movement state. The per-serial Python replay collapses to
# ONE grouped aggregate — deterministic under equal-timestamp ties via
# the fixed-width (date|flag) tag.
# ---------------------------------------------------------------------------


@query(
    "m4_serial_rebuild",
    oracle="""
    WITH moves AS (
      SELECT l_partkey, l_suppkey, l_linenumber % 3 AS location_id,
             l_shipdate, l_returnflag, l_quantity,
             strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') || '|' || l_returnflag
                 AS move_tag
      FROM lineitem
    ),
    agg AS (
      SELECT l_partkey, l_suppkey, location_id,
             COUNT(*) AS n_moves,
             COUNT(DISTINCT move_tag) AS n_distinct,
             SUM(CASE WHEN l_returnflag <> 'R' THEN l_quantity ELSE 0 END) AS qty_in,
             SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END) AS qty_out,
             strftime(MIN(l_shipdate), '%Y-%m-%d') AS first_move_date,
             substr(MAX(move_tag), 1, 10) AS last_move_date,
             CASE WHEN substr(MAX(move_tag), 21, 1) = 'R'
                  THEN 'returned' ELSE 'in_stock' END AS state
      FROM moves GROUP BY 1, 2, 3
    )
    SELECT l_partkey, l_suppkey, location_id, n_moves,
           CAST(n_moves - n_distinct AS BIGINT) AS dup_moves_removed,
           CAST(qty_in AS DOUBLE) AS qty_in,
           CAST(qty_out AS DOUBLE) AS qty_out,
           CAST(qty_in - qty_out AS DOUBLE) AS net_before,
           CAST(CASE WHEN qty_in - qty_out < 0 THEN qty_out - qty_in
                     ELSE 0 END AS DOUBLE) AS opening_correction,
           CASE WHEN qty_in - qty_out < 0 THEN first_move_date END
               AS correction_date,
           CAST(CASE WHEN qty_in - qty_out < 0 THEN 0
                     ELSE qty_in - qty_out END AS DOUBLE) AS net_after,
           last_move_date, state
    FROM agg
    """,
)
def m4_serial_rebuild(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    # the move identity is (ship ts, flag). Mixing COUNT(DISTINCT pair)
    # with plain aggregates makes Catalyst plan an Expand (every row
    # duplicated once per aggregate family) — measured ~20% of the job.
    # Aggregating in two levels instead keeps each row single: level 1
    # groups by (stock key, move identity) so level 2's n_distinct is a
    # plain COUNT(*), and the last-state struct/display string derive
    # from the level-1 keys (fixed-width ISO format keeps orderings
    # identical).
    is_out = F.col("l_returnflag") == "R"
    lim = li.withColumn("location_id", F.col("l_linenumber") % 3)
    # Level 1's groups are near-distinct per row (~590k of 600k), so
    # map-side partial aggregation reduces almost nothing while the
    # whole hash build runs on the one-row-group scan's single task.
    # When the scan is narrower than the cluster, repartition on the
    # EXACT level-1 keys BEFORE aggregating: the groupBy's own exchange
    # is elided (the clustering requirement is already satisfied), so
    # the shuffle count stays 2 — the one shuffle just moves below the
    # aggregate and the hash build runs cluster-wide (interleaved A/B
    # best-of-7, two sessions: −10.0% / −6.4%). At real scale the guard
    # never fires and the standard partial-agg shape is kept.
    _keys = ("l_partkey", "l_suppkey", "location_id", "l_shipdate", "l_returnflag")
    lim = respread_narrow(lim, _keys, exact_keys=True)
    per_move = lim.groupBy(*_keys).agg(
        F.count("*").alias("c"),
        F.sum("l_quantity").alias("qty"),
    )
    agg = per_move.groupBy("l_partkey", "l_suppkey", "location_id").agg(
        F.sum("c").alias("n_moves"),
        F.count("*").alias("n_distinct"),
        F.sum(F.when(~is_out, F.col("qty")).otherwise(0)).alias("qty_in"),
        F.sum(F.when(is_out, F.col("qty")).otherwise(0)).alias("qty_out"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_move_date"),
        F.max(F.struct("l_shipdate", "l_returnflag")).alias("mt"),
    )
    net = F.col("qty_in") - F.col("qty_out")
    return agg.select(
        "l_partkey",
        "l_suppkey",
        "location_id",
        "n_moves",
        (F.col("n_moves") - F.col("n_distinct")).cast("bigint").alias("dup_moves_removed"),
        F.col("qty_in").cast("double").alias("qty_in"),
        F.col("qty_out").cast("double").alias("qty_out"),
        net.cast("double").alias("net_before"),
        F.when(net < 0, -net).otherwise(F.lit(0)).cast("double").alias("opening_correction"),
        F.when(net < 0, F.col("first_move_date")).alias("correction_date"),
        F.when(net < 0, F.lit(0)).otherwise(net).cast("double").alias("net_after"),
        F.date_format(F.col("mt.l_shipdate"), "yyyy-MM-dd").alias("last_move_date"),
        F.when(F.col("mt.l_returnflag") == "R", "returned")
        .otherwise("in_stock")
        .alias("state"),
    )


# ---------------------------------------------------------------------------
# Partner-less bucket: NULL groupby keys get their own row, like the
# partner ledger's `_get_sums_without_partner`
# (account_partner_ledger.py:313-346, :418-425). Spark groupBy keeps
# NULL keys as a group (unlike SQL `IN` semantics) — this entry pins
# that behavior against the oracle, including the NULL-key hash canon.
# ---------------------------------------------------------------------------


@query(
    "pl_null_partner_bucket",
    oracle=f"""
    SELECT NULLIF(o_custkey % 50, 0) AS partner_bucket,
           COUNT(*) AS n, {o_dsum('o_totalprice')} AS amount
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <= TIMESTAMP '1997-12-31 23:59:59'
    GROUP BY 1
    """,
)
def pl_null_partner_bucket(spark, sf_dir):
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") <= "1997-12-31 23:59:59")
    )
    return o.groupBy(
        F.nullif(F.col("o_custkey") % 50, F.lit(0)).alias("partner_bucket")
    ).agg(F.count("*").alias("n"), dsum("o_totalprice").alias("amount"))


# ---------------------------------------------------------------------------
# Configurable fiscal year: a June-30 company (fiscalyear_last_month=6,
# compute_fiscalyear_dates in res.company; consumed by the date scopes of
# account_report.py:622-659). Two scope blocks anchored at 1997-09-30:
# 'from_fiscalyear' resolves to [1997-07-01, 1997-09-30] and
# 'to_beginning_of_fiscalyear' to (-inf, 1997-06-30]; the period labels
# pin period_info's fiscalyear detection + previous_period's FY shift.
# ---------------------------------------------------------------------------


@query(
    "fy_period_shift",
    oracle=f"""
    WITH {O_LEDGER}
    SELECT 'fy_to_date' AS block, 'FY 1998' AS period_label,
           substr(account_code, 1, 1) AS account_class,
           CAST(SUM(conv) AS DOUBLE) AS balance, COUNT(*) AS n_rows
    FROM led
    WHERE date >= TIMESTAMP '1997-07-01'
      AND date <= TIMESTAMP '1997-09-30 23:59:59'
    GROUP BY substr(account_code, 1, 1)
    UNION ALL
    SELECT 'fy_opening', 'FY 1997', substr(account_code, 1, 1),
           CAST(SUM(conv) AS DOUBLE), COUNT(*)
    FROM led
    WHERE date <= TIMESTAMP '1997-06-30 23:59:59'
    GROUP BY substr(account_code, 1, 1)
    """,
)
def fy_period_shift(spark, sf_dir):
    from ..engines.ledger import move_lines
    from ..engines.options import (
        date_scope_filter,
        fiscal_year_bounds,
        make_options,
        period_info,
        previous_period,
    )
    import datetime as dt

    fy_end = (6, 30)
    opts = make_options("1997-07-01", "1997-09-30", fiscal_year_end=fy_end)
    # the FY containing the anchor date, as a labeled period; its
    # previous period labels the opening block
    lo, hi = fiscal_year_bounds(dt.date.fromisoformat("1997-09-30"), fy_end)
    cur = period_info(lo.isoformat(), hi.isoformat(), fy_end=fy_end)
    assert cur["period_type"] == "fiscalyear"
    prev = previous_period(cur)

    led = move_lines(spark, sf_dir)
    klass = F.substring("account_code", 1, 1).alias("account_class")

    def block(name, label, scope):
        return (
            led.where(date_scope_filter(opts, scope))
            .groupBy(klass)
            .agg(
                F.sum("conv").cast("double").alias("balance"),
                F.count("*").alias("n_rows"),
            )
            .select(
                F.lit(name).alias("block"),
                F.lit(label).alias("period_label"),
                "account_class", "balance", "n_rows",
            )
        )

    return block("fy_to_date", cur["string"], "from_fiscalyear").unionByName(
        block("fy_opening", prev["string"], "to_beginning_of_fiscalyear")
    )


# ---------------------------------------------------------------------------
# Multi-company scope + variant selection (`account_report.py:1408-1456`):
# the company selector scopes every predicate to the allowed companies,
# and the active company's fiscal country picks which report variant
# runs (country variant over the generic root). The chosen variant's
# name is part of the hashed result, pinning the selection logic.
# ---------------------------------------------------------------------------


@query(
    "mc_company_scope",
    oracle=f"""
    WITH {O_LEDGER}
    SELECT 'tax_report_de' AS report_name, company_id,
           substr(account_code, 1, 1) AS account_class,
           CAST(SUM(conv) AS DOUBLE) AS balance, COUNT(*) AS n_rows
    FROM led
    WHERE company_id IN (0, 1)
      AND date >= TIMESTAMP '1997-01-01'
      AND date <= TIMESTAMP '1997-12-31 23:59:59'
    GROUP BY company_id, substr(account_code, 1, 1)
    """,
)
def mc_company_scope(spark, sf_dir):
    from ..engines.ledger import move_lines
    from ..engines.options import (
        company_scope_filter,
        date_scope_filter,
        init_report_options,
    )

    report_defs = [
        {"name": "tax_report_generic", "country": None,
         "availability_condition": "always"},
        {"name": "tax_report_de", "country": "DE",
         "availability_condition": "country"},
        {"name": "tax_report_fr", "country": "FR",
         "availability_condition": "country"},
    ]
    companies = [{"id": 0, "country": "DE"}, {"id": 1, "country": "FR"}]
    opts = init_report_options(report_defs, companies,
                               "1997-01-01", "1997-12-31")
    led = move_lines(spark, sf_dir)
    return (
        led.where(date_scope_filter(opts, "strict_range")
                  & company_scope_filter(opts))
        .groupBy(
            "company_id",
            F.substring("account_code", 1, 1).alias("account_class"),
        )
        .agg(
            F.sum("conv").cast("double").alias("balance"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.lit(opts["report"]["name"]).alias("report_name"),
            "company_id", "account_class", "balance", "n_rows",
        )
    )


# ---------------------------------------------------------------------------
# child_of domain operator (osv.expression semantics; reference usage
# `account_analytic_report.py:60` — ('plan_id', 'child_of', plan.id)).
# The hierarchy dim (regions as roots, nations as children) is bounded,
# so the subtree expands driver-side to a literal IN list that pushes
# into the fact-side scan; the dim is never joined for the filter.
# ---------------------------------------------------------------------------


@query(
    "f7_child_of",
    oracle=f"""
    SELECT n.n_name AS nation, COUNT(*) AS n_orders,
           {o_dsum('o.o_totalprice')} AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_regionkey = 2
    GROUP BY n.n_name
    """,
)
def f7_child_of(spark, sf_dir):
    """Orders of customers whose geography is child_of region 2 in a
    two-level region→nation hierarchy. The child_of leaf compiles to a
    pushable IN over the expanded subtree (F1 + hierarchy expansion)."""
    from ..domain import compile_domain
    from ..operators.hierarchy import Hierarchy

    # region ids offset by 100 so the two levels share one id space
    regions = load(spark, sf_dir, "region").select("r_regionkey").collect()
    nations = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    ).collect()
    h = Hierarchy.from_pairs(
        [(100 + r.r_regionkey, None) for r in regions]
        + [(n.n_nationkey, 100 + n.n_regionkey) for n in nations]
    )
    pred = compile_domain(
        [("geo_id", "child_of", 102)], hierarchies={"geo_id": h}
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    fact = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("geo_id", F.col("c_nationkey"))
        .where(pred)
    )
    return (
        fact.join(F.broadcast(n), fact.geo_id == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Fiscal-position filter (multi-VAT) — `_init_options_fiscal_position`
# + `_get_options_fiscal_position_domain` (`account_report.py:999-1083`).
# The fact's fiscal position derives from the move id (moves % 4 == 0
# carry none); the selected scope compiles to a domain predicate that
# rides the pushed-down scan filter like the company scope.
# ---------------------------------------------------------------------------

_FPOS = [
    {"id": 1, "name": "DE domestic", "company_id": 0, "country": "DE",
     "foreign_vat": False},
    {"id": 2, "name": "DE region B", "company_id": 0, "country": "DE",
     "foreign_vat": True},
    {"id": 3, "name": "FR OSS", "company_id": 0, "country": "FR",
     "foreign_vat": True},
]

_FPOS_DERIVE_SQL = (
    "CASE WHEN move_id % 4 = 0 THEN NULL ELSE CAST(move_id % 4 AS INT) END"
)


def _fp_scoped(spark, sf_dir, previous=None):
    from ..engines.ledger import move_lines
    from ..engines.options import (
        fiscal_position_domain,
        init_options_fiscal_position,
        make_options,
    )
    from ..domain import compile_domain

    opts = make_options("1997-01-01", "1997-12-31")
    opts["companies"] = [0]
    init_options_fiscal_position(
        opts, _FPOS, report_country="DE", company_country="DE", previous=previous
    )
    dom = fiscal_position_domain(opts, _FPOS)
    led = move_lines(spark, sf_dir).withColumn(
        "fiscal_position_id", F.expr(_FPOS_DERIVE_SQL)
    )
    return (
        led.where(
            (F.col("date") >= "1997-01-01")
            & (F.col("date") <= "1997-12-31 23:59:59")
            & compile_domain(dom)
        )
        .groupBy(F.substring("account_code", 1, 1).alias("account_class"))
        .agg(
            F.sum("conv").cast("double").alias("balance"),
            F.count("*").alias("n_rows"),
        )
        .withColumn("fiscal_position", F.lit(str(opts["fiscal_position"])))
    )


_FP_ORACLE_BODY = f"""
    SELECT substr(account_code, 1, 1) AS account_class,
           CAST(SUM(conv) AS DOUBLE) AS balance,
           COUNT(*) AS n_rows,
           '{{sel}}' AS fiscal_position
    FROM (SELECT led.*, {_FPOS_DERIVE_SQL} AS fiscal_position_id FROM led)
    WHERE date >= TIMESTAMP '1997-01-01'
      AND date <= TIMESTAMP '1997-12-31 23:59:59'
      AND ({{pred}})
    GROUP BY 1
"""


@query(
    "fp_scope",
    oracle=f"""
    WITH {O_LEDGER}
    {_FP_ORACLE_BODY.format(
        sel="domestic",
        pred="fiscal_position_id IS NULL OR fiscal_position_id IN (1)")}
    """,
)
def fp_scope(spark, sf_dir):
    """Default selection for a DE report on a DE company: 'domestic' —
    moves without a position or under a non-foreign-VAT one."""
    return _fp_scoped(spark, sf_dir)


@query(
    "fp_scope_foreign",
    oracle=f"""
    WITH {O_LEDGER}
    {_FP_ORACLE_BODY.format(sel="2", pred="fiscal_position_id = 2")}
    """,
)
def fp_scope_foreign(spark, sf_dir):
    """A persisted previous selection of the foreign-VAT position is
    legit (it is in the accepted set) and scopes to exactly that
    position's moves."""
    return _fp_scoped(spark, sf_dir, previous={"fiscal_position": 2})


# ---------------------------------------------------------------------------
# Tax-unit multi-company mode (`account_report.py:1090-1148`): the
# report's company scope comes from the selected tax unit, not the
# company selector. The unit's main company is the adjustment target
# the carryover engine uses (engines/carryover.py).
# ---------------------------------------------------------------------------

_TAX_UNITS = [
    {"id": 1, "name": "DE VAT group", "country": "DE",
     "company_ids": [0, 2], "main_company_id": 0},
    {"id": 2, "name": "FR VAT group", "country": "FR",
     "company_ids": [1], "main_company_id": 1},
]


@query(
    "mc_tax_unit",
    oracle=f"""
    WITH {O_LEDGER}
    SELECT 'DE VAT group' AS tax_unit, company_id,
           company_id = 0 AS is_main_company,
           substr(account_code, 1, 1) AS account_class,
           CAST(SUM(conv) AS DOUBLE) AS balance, COUNT(*) AS n_rows
    FROM led
    WHERE company_id IN (0, 2)
      AND date >= TIMESTAMP '1997-01-01'
      AND date <= TIMESTAMP '1997-12-31 23:59:59'
    GROUP BY company_id, substr(account_code, 1, 1)
    """,
)
def mc_tax_unit(spark, sf_dir):
    """Selected companies {0, 2} match the DE unit's set, so the unit
    auto-selects, replaces the company scope with its companies and
    designates company 0 as the main (adjustment) company."""
    from ..engines.ledger import move_lines
    from ..engines.options import (
        company_scope_filter,
        date_scope_filter,
        init_options_tax_units,
        make_options,
    )

    opts = make_options("1997-01-01", "1997-12-31")
    opts["companies"] = [0, 2]
    init_options_tax_units(
        opts, _TAX_UNITS, active_company=0, report_country="DE"
    )
    assert opts["tax_unit"] == 1 and opts["main_company"] == 0
    unit = next(u for u in _TAX_UNITS if u["id"] == opts["tax_unit"])
    led = move_lines(spark, sf_dir)
    return (
        led.where(
            date_scope_filter(opts, "strict_range") & company_scope_filter(opts)
        )
        .groupBy(
            "company_id",
            F.substring("account_code", 1, 1).alias("account_class"),
        )
        .agg(
            F.sum("conv").cast("double").alias("balance"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.lit(unit["name"]).alias("tax_unit"),
            "company_id",
            (F.col("company_id") == opts["main_company"]).alias("is_main_company"),
            "account_class",
            "balance",
            "n_rows",
        )
    )

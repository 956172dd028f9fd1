"""Unit tests for the expression-engine layer — the Spark port of the
reference's `tests/test_report_engines.py` strategy: tiny synthetic
ledgers with hand-computed expected totals, plus pure-Python tests for
the account_codes parser and the aggregation fixpoint quirks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_staging_spark.engines import account_codes as ac
from etl_staging_spark.engines import aggregation, formula
from etl_staging_spark.engines.options import (
    date_bounds,
    date_scope_filter,
    make_options,
)

OPTS = make_options("2020-01-01", "2020-12-31")


# ---------------------------------------------------------------------------
# account_codes parser
# ---------------------------------------------------------------------------


def test_parse_simple_prefix():
    (t,) = ac.parse_formula("123")
    assert (t.sign, t.prefix, t.excluded, t.balance_char) == (1, "123", (), "")


def test_parse_exclusions_and_gates():
    terms = ac.parse_formula("123D\\(1235) + 56 - 416C")
    # greedy: D before \( belongs to the prefix (reference regex)
    assert terms[0].prefix == "123D" and terms[0].excluded == ("1235",)
    assert terms[0].balance_char == ""
    assert terms[1] == ac.Term(1, "56", (), "")
    assert terms[2] == ac.Term(-1, "416", (), "C")


def test_parse_gate_after_exclusion():
    (t,) = ac.parse_formula("2\\(29,28)C")
    assert (t.prefix, t.excluded, t.balance_char) == ("2", ("29", "28"), "C")


def test_parse_trailing_backslash_keeps_dc_in_prefix():
    (t,) = ac.parse_formula("123D\\")
    assert (t.prefix, t.balance_char) == ("123D", "")


def test_parse_invalid_raises():
    with pytest.raises(ValueError):
        ac.parse_formula("1*2")


# ---------------------------------------------------------------------------
# aggregation engine: fixpoint + bounds quirks
# ---------------------------------------------------------------------------


def test_fixpoint_chain_substitution():
    res = aggregation.evaluate(
        base_values={"A.balance": 10.0, "B.balance": 4.0},
        formulas={
            "C.balance": "A.balance - B.balance",
            "D.balance": "C.balance * 2",
        },
    )
    assert res["C.balance"] == 6.0
    assert res["D.balance"] == 12.0


def test_zero_division_is_zero():
    res = aggregation.evaluate(
        base_values={"A.balance": 5.0},
        formulas={"R.balance": "A.balance / (A.balance - A.balance)"},
    )
    assert res["R.balance"] == 0.0


def test_bounds_if_above_below_between():
    assert aggregation.apply_bounds("if_above(USD(100))", 150.0) == 150.0
    assert aggregation.apply_bounds("if_above(USD(100))", 100.0) == 0.0
    assert aggregation.apply_bounds("if_below(USD(100))", 50.0) == 50.0
    assert aggregation.apply_bounds("if_below(USD(100))", 100.0) == 0.0
    # the reference CODE zeroes outside the bounds (docstring claims
    # clamping; the code wins)
    assert aggregation.apply_bounds("if_between(USD(0),USD(10))", 5.0) == 5.0
    assert aggregation.apply_bounds("if_between(USD(0),USD(10))", 11.0) == 0.0
    assert aggregation.apply_bounds("if_between(USD(0),USD(10))", -1.0) == 0.0


def test_bounds_round_ties_away_from_zero():
    # quantizing on repr() gives the intuitive decimal result, unlike
    # raw-float rounding where 1.005 is stored slightly below 1.005
    assert aggregation.apply_bounds("round(2)", 1.005) == 1.01
    assert aggregation.apply_bounds("round(0)", 2.5) == 3.0
    assert aggregation.apply_bounds("round(0)", -2.5) == -3.0


def test_if_other_expr_gating():
    res = aggregation.evaluate(
        base_values={"REV.balance": 2000.0, "COST.balance": 300.0},
        formulas={"G.balance": "COST.balance"},
        subformulas={"G.balance": "if_other_expr_above(REV.balance, USD(1000))"},
    )
    assert res["G.balance"] == 300.0
    res2 = aggregation.evaluate(
        base_values={"REV.balance": 500.0, "COST.balance": 300.0},
        formulas={"G.balance": "COST.balance"},
        subformulas={"G.balance": "if_other_expr_above(REV.balance, USD(1000))"},
    )
    assert res2["G.balance"] == 0.0


def test_bounded_term_not_substituted_textually():
    """A bounded expression referenced by another formula must contribute
    its BOUNDED value, not its raw formula text."""
    res = aggregation.evaluate(
        base_values={"A.balance": 50.0},
        formulas={
            "B.balance": "A.balance",
            "C.balance": "B.balance * 2",
        },
        subformulas={"B.balance": "if_above(USD(100))"},  # 50 <= 100 -> 0
    )
    assert res["B.balance"] == 0.0
    assert res["C.balance"] == 0.0


def test_safe_eval_rejects_non_arithmetic():
    with pytest.raises(ValueError):
        aggregation.safe_eval("__import__('os')")


# ---------------------------------------------------------------------------
# date scopes
# ---------------------------------------------------------------------------


def test_date_bounds_scopes():
    assert date_bounds(OPTS, "strict_range") == ("2020-01-01", "2020-12-31", False)
    assert date_bounds(OPTS, "normal") == ("2020-01-01", "2020-12-31", True)
    assert date_bounds(OPTS, "from_beginning") == (None, "2020-12-31", False)
    assert date_bounds(OPTS, "to_beginning_of_period") == (None, "2019-12-31", False)
    opts2 = make_options("2020-04-01", "2020-06-30")
    assert date_bounds(opts2, "from_fiscalyear") == ("2020-01-01", "2020-06-30", False)
    assert date_bounds(opts2, "to_beginning_of_fiscalyear") == (None, "2019-12-31", False)


def test_normal_scope_keeps_bs_accounts_before_from(spark):
    rows = [
        # (id, date, account_code, conv-ish marker)
        (1, "2019-06-01", "100"),  # BS account before period -> kept
        (2, "2019-06-01", "600"),  # P&L before period -> dropped
        (3, "2020-06-01", "600"),  # in period -> kept
    ]
    df = spark.createDataFrame(rows, "id long, d string, account_code string").select(
        "id", F.col("d").cast("timestamp").alias("date"), "account_code"
    )
    kept = {r.id for r in df.where(date_scope_filter(OPTS, "normal")).collect()}
    assert kept == {1, 3}
    strict = {r.id for r in df.where(date_scope_filter(OPTS, "strict_range")).collect()}
    assert strict == {3}


# ---------------------------------------------------------------------------
# engines on a tiny synthetic ledger
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_ledger(spark):
    rows = [
        # id, date, account_code, partner, conv, tag_name, tag_sign, invert
        (1, "2020-02-01", "101", 1, "100.00", "T1", "+", False),
        (2, "2020-03-01", "101", 1, "-30.00", "T1", "-", False),
        (3, "2020-04-01", "104", 2, "50.00", "T1", "+", True),
        (4, "2020-05-01", "600", 2, "-200.00", "T2", "-", False),
        (5, "2019-01-01", "101", 1, "999.00", "T2", "+", False),  # out of period
    ]
    df = spark.createDataFrame(
        rows,
        "id long, d string, account_code string, partner_id long, conv_s string,"
        " tag_name string, tag_sign string, tax_tag_invert boolean",
    )
    return df.select(
        "id",
        F.col("d").cast("timestamp").alias("date"),
        "account_code",
        "partner_id",
        F.col("conv_s").cast("decimal(18,2)").alias("conv"),
        "tag_name",
        "tag_sign",
        "tax_tag_invert",
    )


def test_domain_engine_sign_gate_on_total(tiny_ledger):
    out = formula.domain_engine(
        tiny_ledger,
        OPTS,
        {
            "acc1": [("account_code", "=like", "1%")],  # total 120 >= 0
            "acc6": [("account_code", "=like", "6%")],  # total -200 < 0
        },
        groupby="account_code",
    ).collect()
    by_key = {(r.formula, r.grouping_key): r for r in out}
    r101 = by_key[("acc1", "101")]
    assert r101.res_sum == 70.0 and r101.res_sum_if_pos == 70.0
    assert r101.res_sum_if_neg == 0.0 and r101.count_rows == 2
    r600 = by_key[("acc6", "600")]
    assert r600.res_sum == -200.0 and r600.res_sum_if_pos == 0.0
    assert r600.res_sum_if_neg == -200.0


def test_tax_tags_engine_signs(tiny_ledger):
    out = {r.formula: r for r in formula.tax_tags_engine(tiny_ledger, OPTS, ["T1", "T2"]).collect()}
    # T1: +100 (+,noinv) + 30 (-, noinv => -1 * -30) + -50 (+, inv) = 80
    assert out["T1"].balance == pytest.approx(100 + 30 - 50)
    # T2: -200 with '-' sign => +200
    assert out["T2"].balance == pytest.approx(200.0)


def test_account_codes_engine_gating(tiny_ledger):
    out = {
        r.formula: r.result
        for r in ac.evaluate_formulas(
            tiny_ledger, OPTS, ["1", "1\\(104)", "1D", "1C", "10\\(101)D"]
        ).collect()
    }
    assert out["1"] == pytest.approx(120.0)          # 70 + 50
    assert out["1\\(104)"] == pytest.approx(70.0)
    assert out["1D"] == pytest.approx(120.0)         # both accounts >= 0
    assert out["1C"] == 0.0
    assert out["10\\(101)D"] == pytest.approx(50.0)  # only 104


def test_account_codes_empty_term_contributes_zero(tiny_ledger):
    """Regression: a term matching no account (or fully gated out) must
    contribute 0, not NULL — `1 + 9` was returning 0.0 instead of 120."""
    out = {
        r.formula: r.result
        for r in ac.evaluate_formulas(
            tiny_ledger, OPTS, ["1 + 9", "9", "1 + 6D", "1 - 9C"]
        ).collect()
    }
    assert out["1 + 9"] == pytest.approx(120.0)   # no account starts with 9
    assert out["9"] == 0.0
    assert out["1 + 6D"] == pytest.approx(120.0)  # 600's total is < 0: D-gated out
    assert out["1 - 9C"] == pytest.approx(120.0)


# ---------------------------------------------------------------------------
# Comparison-period generation (account_report.py:348-457; reference
# test_account_reports_filters.py expectations)
# ---------------------------------------------------------------------------


def test_period_type_detection_and_labels():
    from etl_staging_spark.engines.options import period_info

    assert period_info("2020-02-01", "2020-02-29")["period_type"] == "month"
    assert period_info("2020-02-01", "2020-02-29")["string"] == "Feb 2020"
    assert period_info("2020-04-01", "2020-06-30")["period_type"] == "quarter"
    assert period_info("2020-04-01", "2020-06-30")["string"] == "Q2 2020"
    assert period_info("2020-01-01", "2020-12-31")["string"] == "2020"
    custom = period_info("2020-01-15", "2020-03-10")
    assert custom["period_type"] == "custom"
    assert period_info(None, "2020-03-10", mode="single")["string"] == "As of 2020-03-10"


def test_previous_period_chains():
    from etl_staging_spark.engines.options import period_info, previous_period

    jan = previous_period(period_info("2020-02-01", "2020-02-29"))
    assert (jan["date_from"], jan["date_to"]) == ("2020-01-01", "2020-01-31")
    dec = previous_period(jan)
    assert (dec["date_from"], dec["date_to"]) == ("2019-12-01", "2019-12-31")
    q1 = previous_period(period_info("2020-04-01", "2020-06-30"))
    assert (q1["date_from"], q1["date_to"]) == ("2020-01-01", "2020-03-31")
    y19 = previous_period(period_info("2020-01-01", "2020-12-31"))
    assert (y19["date_from"], y19["date_to"]) == ("2019-01-01", "2019-12-31")
    # reference quirk: previous of a CUSTOM range is the MONTH containing
    # the day before its start (not a same-length range) —
    # account_report.py:441-442
    prev = previous_period(period_info("2020-03-15", "2020-04-10"))
    assert (prev["date_from"], prev["date_to"]) == ("2020-03-01", "2020-03-31")
    assert prev["period_type"] == "month"


def test_previous_year_resnaps_months():
    from etl_staging_spark.engines.options import period_info, previous_year

    feb19 = previous_year(period_info("2020-02-01", "2020-02-29"))  # leap -> non-leap
    assert (feb19["date_from"], feb19["date_to"]) == ("2019-02-01", "2019-02-28")
    y = previous_year(period_info("2020-01-01", "2020-12-31"))
    assert (y["date_from"], y["date_to"]) == ("2019-01-01", "2019-12-31")


def test_build_comparison_periods():
    from etl_staging_spark.engines.options import build_comparison, make_options

    opts = build_comparison(
        make_options("2020-03-01", "2020-03-31"), "previous_period", 2
    )
    ps = opts["comparison"]["periods"]
    assert [(p["date_from"], p["date_to"]) for p in ps] == [
        ("2020-02-01", "2020-02-29"),
        ("2020-01-01", "2020-01-31"),
    ]
    opts2 = build_comparison(
        make_options("2020-01-01", "2020-12-31"), "same_last_year", 2
    )
    ps2 = opts2["comparison"]["periods"]
    assert [(p["date_from"], p["date_to"]) for p in ps2] == [
        ("2019-01-01", "2019-12-31"),
        ("2018-01-01", "2018-12-31"),
    ]


# ---------------------------------------------------------------------------
# E6 cross_report: foreign terms under a forced date scope
# ---------------------------------------------------------------------------


def test_cross_report_forced_scope(tiny_ledger):
    from etl_staging_spark.engines import cross_report as xr

    registry = {
        ln.key: ln
        for ln in [
            xr.Line("ASSETS", "domain", [("account_code", "=like", "1%")]),
            xr.Line("DOUBLE_ASSETS", "aggregation", "ASSETS.balance * 2"),
        ]
    }
    report = [
        xr.Line("EXP", "domain", [("account_code", "=like", "6%")]),
        # forced 'from_beginning' pulls the out-of-period row 5 (+999)
        # into ASSETS: 70 + 50 + 999 = 1119, not the in-period 120
        xr.Line(
            "TOT",
            "aggregation",
            "EXP.balance + DOUBLE_ASSETS.balance",
            subformula=xr.CROSS_REPORT,
            date_scope="from_beginning",
        ),
    ]
    vals = xr.evaluate_report(tiny_ledger, OPTS, report, registry)
    assert vals["EXP.balance"] == pytest.approx(-200.0)  # strict 2020
    assert vals["ASSETS.balance"] == pytest.approx(1119.0)  # forced as-of
    assert vals["TOT.balance"] == pytest.approx(-200.0 + 2 * 1119.0)


def test_cross_report_conflicting_scopes_rejected(tiny_ledger):
    from etl_staging_spark.engines import cross_report as xr

    registry = {"A.balance": xr.Line("A", "domain", [("account_code", "=like", "1%")])}
    report = [
        xr.Line("X", "aggregation", "A.balance", subformula=xr.CROSS_REPORT,
                date_scope="strict_range"),
        xr.Line("Y", "aggregation", "A.balance * 2", subformula=xr.CROSS_REPORT,
                date_scope="from_beginning"),
    ]
    with pytest.raises(ValueError, match="two forced scopes"):
        xr.evaluate_report(tiny_ledger, OPTS, report, registry)


# ---------------------------------------------------------------------------
# E4 carryover chain (reference test_tax_report_carryover.py analog)
# ---------------------------------------------------------------------------


def test_carryover_two_period_chain():
    """Reference scenario: -1000 in period 1 carries; period 2's +1500
    absorbs it (balance 500, nothing carries on)."""
    from decimal import Decimal

    from etl_staging_spark.engines.carryover import fold_chain

    chain = fold_chain([(1, Decimal("-1000")), (2, Decimal("1500"))])
    assert chain[0]["carry"] == Decimal("-1000") and chain[0]["balance"] == 0
    assert chain[1]["applied"] == Decimal("-1000")
    assert chain[1]["unbound"] == Decimal("500")
    assert chain[1]["carry"] == 0 and chain[1]["balance"] == Decimal("500")
    # a chain that never recovers keeps accumulating
    chain2 = fold_chain([(1, Decimal("-1000")), (2, Decimal("-200")), (3, Decimal("300"))])
    assert chain2[1]["carry"] == Decimal("-1200")
    assert chain2[2]["carry"] == Decimal("-900") and chain2[2]["balance"] == 0


def test_carryover_unit_adjustment(spark):
    """Multi-company: bounds are non-linear, so the unit fold differs
    from the sum of company folds; the difference lands on the main
    company as an 'adjustment' row (account_report.py:3001-3018)."""
    from etl_staging_spark.engines.carryover import generate_carryover_values

    bases = spark.createDataFrame(
        # p1: c0 -1000, c1 +400 -> unit -600; companies carry -1000, unit -600
        # p2: c0 +1000, c1 -100 -> c0 unbound 0, c1 -100; unit: -600+900=+300
        [(1, 0, "-1000.00"), (1, 1, "400.00"), (2, 0, "1000.00"), (2, 1, "-100.00")],
        "period int, company_id int, base_s string",
    ).selectExpr("period", "company_id", "CAST(base_s AS DECIMAL(18,2)) AS base")
    out = generate_carryover_values(
        spark, bases, {1: "2021-06-30", 2: "2021-12-31"}, main_company=0
    )
    rows = {(r.date, r.company_id, r.kind): r.value for r in out.collect()}
    assert rows[("2021-06-30", 0, "carryover")] == -1000.0
    # adjustment brings stored total (-1000) up to the unit carry (-600)
    assert rows[("2021-06-30", 0, "adjustment")] == 400.0
    # p2: company 1 carries -100; company 0 carries 0 (absorbed); unit
    # carries 0 (unbound +300) -> adjustment +100 on main company
    assert rows[("2021-12-31", 1, "carryover")] == -100.0
    assert rows[("2021-12-31", 0, "adjustment")] == 100.0
    assert ("2021-12-31", 0, "carryover") not in rows  # zero rows skipped


def test_external_engine_sum_and_most_recent(spark):
    rows = [
        ("m", "2020-01-05", "10.00"),
        ("m", "2020-01-05", "5.00"),
        ("m", "2020-01-02", "99.00"),
        ("m", "2021-01-01", "777.00"),  # outside period
        ("s", "2020-01-02", "1.00"),
        ("s", "2020-01-03", "2.00"),
    ]
    ext = spark.createDataFrame(rows, "target_expression string, d string, v string").select(
        "target_expression",
        F.col("d").cast("date").alias("date"),
        F.col("v").cast("decimal(18,2)").alias("value_dec"),
    )
    out = {
        (r.expression, r.formula): r.result
        for r in formula.external_engine(
            ext, OPTS, {"s": "sum", "m": "most_recent"}
        ).collect()
    }
    assert out[("s", "sum")] == 3.0
    # most_recent: latest date in period is 01-05, summed per that date
    assert out[("m", "most_recent")] == 15.0


def test_fiscal_year_bounds():
    import datetime as dt
    from etl_staging_spark.engines.options import fiscal_year_bounds

    # calendar default
    assert fiscal_year_bounds(dt.date(1997, 3, 15)) == (
        dt.date(1997, 1, 1), dt.date(1997, 12, 31))
    # June-30 company: FY named by its end year
    assert fiscal_year_bounds(dt.date(1997, 9, 30), (6, 30)) == (
        dt.date(1997, 7, 1), dt.date(1998, 6, 30))
    assert fiscal_year_bounds(dt.date(1997, 6, 30), (6, 30)) == (
        dt.date(1996, 7, 1), dt.date(1997, 6, 30))
    # short-month year-end clamps (Feb 29 setting in a non-leap year)
    assert fiscal_year_bounds(dt.date(2021, 5, 1), (2, 29)) == (
        dt.date(2021, 3, 1), dt.date(2022, 2, 28))


def test_fiscal_scope_bounds():
    from etl_staging_spark.engines.options import date_bounds, make_options

    opts = make_options("1997-07-01", "1997-09-30", fiscal_year_end=(6, 30))
    assert date_bounds(opts, "from_fiscalyear") == ("1997-07-01", "1997-09-30", False)
    assert date_bounds(opts, "to_beginning_of_fiscalyear") == (None, "1997-06-30", False)
    # default stays calendar-year
    cal = make_options("1997-07-01", "1997-09-30")
    assert date_bounds(cal, "from_fiscalyear") == ("1997-01-01", "1997-09-30", False)


def test_fiscalyear_period_detection_and_shift():
    from etl_staging_spark.engines.options import period_info, previous_period

    fy = period_info("1997-07-01", "1998-06-30", fy_end=(6, 30))
    assert fy["period_type"] == "fiscalyear"
    assert fy["string"] == "FY 1998"
    prev = previous_period(fy)
    assert prev["period_type"] == "fiscalyear"
    assert (prev["date_from"], prev["date_to"]) == ("1996-07-01", "1997-06-30")
    assert prev["string"] == "FY 1997"
    # a calendar FY still detects as plain 'year' (reference label)
    assert period_info("1997-01-01", "1997-12-31")["period_type"] == "year"


def test_horizontal_group_column_groups():
    from etl_staging_spark.engines.options import (
        build_column_groups, build_comparison, group_options, make_options)

    opts = build_comparison(make_options("1997-01-01", "1997-12-31"),
                            "previous_period", 1)
    opts["horizontal_groups"] = {"field": "company_id", "values": [0, 1]}
    groups = build_column_groups(opts)
    assert list(groups) == ["cg0_hg0", "cg0_hg1", "cg1_hg0", "cg1_hg1"]
    g = group_options(opts, groups["cg1_hg1"])
    assert g["date"]["date_from"] == "1996-01-01"
    assert g["forced_domain"] == [("company_id", "=", 1)]
    # without horizontal groups the keys stay cg{i} (hash stability of
    # every existing column-group entry)
    del opts["horizontal_groups"]
    assert list(build_column_groups(opts)) == ["cg0", "cg1"]


def test_variant_selection_and_company_scope():
    from etl_staging_spark.engines.options import (
        init_report_options, select_variant)

    defs = [
        {"name": "generic", "country": None, "availability_condition": "always"},
        {"name": "de", "country": "DE", "availability_condition": "country"},
    ]
    assert select_variant(defs, "DE")["name"] == "de"
    # no country match -> generic fallback
    assert select_variant(defs, "US")["name"] == "generic"
    opts = init_report_options(
        defs, [{"id": 2, "country": "US"}, {"id": 0, "country": "DE"}],
        "1997-01-01", "1997-12-31")
    assert opts["companies"] == [2, 0]
    assert opts["report"]["name"] == "generic"  # active company = first


# ---------------------------------------------------------------------------
# Fiscal-position + tax-unit option pipelines (account_report.py:
# 999-1040, 1090-1148)
# ---------------------------------------------------------------------------

from etl_staging_spark.engines.options import (  # noqa: E402
    fiscal_position_domain,
    init_options_fiscal_position,
    init_options_tax_units,
    make_options,
)

_FPOS = [
    {"id": 1, "company_id": 0, "country": "DE", "foreign_vat": False},
    {"id": 2, "company_id": 0, "country": "DE", "foreign_vat": True},
    {"id": 3, "company_id": 0, "country": "FR", "foreign_vat": True},
]


def _opts(companies):
    o = make_options("1997-01-01", "1997-12-31")
    o["companies"] = companies
    return o


def test_fpos_default_domestic_when_country_matches():
    o = init_options_fiscal_position(_opts([0]), _FPOS, "DE", "DE")
    assert o["fiscal_position"] == "domestic" and o["allow_domestic"]
    assert [f["id"] for f in o["available_vat_fiscal_positions"]] == [2]
    dom = fiscal_position_domain(o, _FPOS)
    assert dom == ["|", ("fiscal_position_id", "=", None),
                   ("fiscal_position_id", "in", [1])]


def test_fpos_foreign_country_autoselects_single_position():
    # FR report on a DE company: no domestic option, one FR position
    o = init_options_fiscal_position(_opts([0]), _FPOS, "FR", "DE")
    assert not o["allow_domestic"]
    assert o["fiscal_position"] == 3
    assert fiscal_position_domain(o, _FPOS) == [("fiscal_position_id", "=", 3)]


def test_fpos_legit_previous_wins_and_multi_company_disables():
    o = init_options_fiscal_position(
        _opts([0]), _FPOS, "DE", "DE", previous={"fiscal_position": 2}
    )
    assert o["fiscal_position"] == 2
    # multi-company scope disables the filter entirely
    o2 = init_options_fiscal_position(
        _opts([0, 1]), _FPOS, "DE", "DE", previous={"fiscal_position": 2}
    )
    assert o2["fiscal_position"] == "all"
    assert fiscal_position_domain(o2, _FPOS) == []


_UNITS = [
    {"id": 1, "name": "DE unit", "country": "DE",
     "company_ids": [0, 2], "main_company_id": 0},
]


def test_tax_unit_autoselects_when_companies_match():
    o = init_options_tax_units(_opts([0, 2]), _UNITS, 0, report_country="DE")
    assert o["tax_unit"] == 1
    assert o["companies"] == [0, 2] and o["main_company"] == 0


def test_tax_unit_company_only_when_selection_differs():
    o = init_options_tax_units(_opts([0, 1]), _UNITS, 0, report_country="DE")
    assert o["tax_unit"] == "company_only"
    assert o["companies"] == [0, 1] and "main_company" not in o


def test_tax_unit_country_and_membership_filters():
    assert init_options_tax_units(
        _opts([0, 2]), _UNITS, 0, report_country="FR"
    )["tax_unit"] == "company_only"
    assert init_options_tax_units(
        _opts([0, 2]), _UNITS, 1, report_country="DE"
    )["available_tax_units"] == []


def test_tax_unit_main_company_feeds_carryover():
    """The selected unit's main company is the carryover adjustment
    target (engines/carryover.py) — the wiring the reference does via
    account.tax.unit.main_company_id."""
    from decimal import Decimal

    from etl_staging_spark.engines.carryover import fold_chain

    o = init_options_tax_units(_opts([0, 2]), _UNITS, 0, report_country="DE")
    # unit-level fold differs from the per-company sum when bounds kick in
    chain = fold_chain([(1, Decimal("-5")), (2, Decimal("3"))])
    assert chain[1]["applied"] == Decimal("-5")
    assert o["main_company"] == 0

"""Invariant tests for the assembled reports (golden checks run via the
DuckDB oracle in tools/check.py; these assert structural invariants)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_staging_spark.queries.catalog_reports import (
    AGED_AS_OF,
    GL_OPTS,
    aged_report,
    gl_report,
    gl_report_detail,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def gl(spark):
    return gl_report(spark, SF_DIR).collect()


def test_gl_has_both_column_groups_and_keys(gl):
    keys = {(r.column_group_key, r.key) for r in gl}
    assert ("cg0", "sum") in keys and ("cg1", "sum") in keys
    assert ("cg0", "unaffected_earnings") in keys


def test_gl_debit_credit_balance_consistent(gl):
    for r in gl:
        assert r.balance == pytest.approx(r.debit - r.credit, abs=1e-6)


def test_gl_detail_running_balance_reconciles(spark):
    detail = gl_report_detail(spark, SF_DIR)
    # the last running balance per account = opening + sum of amounts
    last = detail.groupBy("account_code").agg(
        F.max_by("running_balance", F.struct("line_date", "id", "amount")).alias("final"),
        F.sum("amount").alias("total"),
    )
    first_dates = detail.groupBy("account_code").agg(
        F.min_by("running_balance", F.struct("line_date", "id", "amount")).alias("first_rb"),
        F.min_by("amount", F.struct("line_date", "id", "amount")).alias("first_amt"),
    )
    joined = last.join(first_dates, "account_code").collect()
    for r in joined:
        opening = r.first_rb - r.first_amt
        assert r.final == pytest.approx(opening + r.total, abs=1e-6)


def test_aged_periods_sum_to_total(spark):
    rows = aged_report(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        s = sum(getattr(r, f"period{i}") for i in range(6))
        assert s == pytest.approx(r.total, abs=1e-6)
        assert r.total != 0  # HAVING dropped settled partners


def test_aged_as_of_documented():
    assert AGED_AS_OF == "1998-06-01"
    assert GL_OPTS["date"]["date_from"] == "1997-01-01"

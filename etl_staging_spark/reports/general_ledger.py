"""General ledger: the reference's `_get_query_sums` + detail shape
(`account_general_ledger.py:203-634`) on the engine ledger.

Three blocks, each a lazy DataFrame unioned per column group:

1. account sums — date scope 'normal' (period rows plus ALL prior rows
   of balance-sheet accounts: that is how opening balances fold into
   the totals), grouped by account;
2. unaffected earnings — prior-fiscal-years P&L collapsed into one
   synthetic line per company (`:258-316`);
3. detail lines — per-account running balance: opening (pre-period,
   BS accounts only) + cumulative sum over (date, id) (`:575-634`).

Scale: blocks 1-2 are one shuffle each on bounded keys; the detail
window partitions by account_code (no global window). Column groups
multiply plans, not scans — Catalyst shares the ledger scan via
exchange reuse where possible, and each block filter is pushed down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

import datetime as dt

from ..engines.ledger import is_balance_sheet
from ..engines.options import (
    build_column_groups,
    date_scope_filter,
    fiscal_year_bounds,
    forced_domain_filter,
    fy_of,
    group_options,
)

def _debit():
    return F.when(F.col("conv") >= 0, F.col("conv")).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )


def _credit():
    return F.when(F.col("conv") < 0, -F.col("conv")).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )


def _fy_start(date_from: str, fy_end: tuple[int, int] = (12, 31)) -> str:
    """Start of the fiscal year containing ``date_from``, per the
    company's year-end setting (`account_general_ledger.py:292-316`
    delegates to compute_fiscalyear_dates)."""
    start, _ = fiscal_year_bounds(dt.date.fromisoformat(date_from), fy_end)
    return start.isoformat()


def gl_sums(led: DataFrame, options: dict) -> DataFrame:
    """Blocks 1+2 for every column group, unioned with
    (column_group_key, key, groupby) keys — the exact result shape of
    the reference's UNION ALL sums query."""
    parts = []
    for cg_key, cg in build_column_groups(options).items():
        opts = group_options(options, cg)
        sums = (
            led.where(date_scope_filter(opts, "normal") & forced_domain_filter(opts))
            .groupBy(F.col("account_code").alias("groupby"))
            .agg(
                F.sum(_debit()).cast("double").alias("debit"),
                F.sum(_credit()).cast("double").alias("credit"),
                F.sum("conv").cast("double").alias("balance"),
                F.date_format(F.max("date"), "yyyy-MM-dd").alias("max_date"),
            )
            .select(
                F.lit(cg_key).alias("column_group_key"),
                F.lit("sum").alias("key"),
                "groupby", "debit", "credit", "balance", "max_date",
            )
        )
        parts.append(sums)

        # unaffected earnings: P&L rows strictly before the fiscal year
        # of the period start, one row per company
        fy_eve = _fy_start(opts["date"]["date_from"], fy_of(opts))
        unaff = (
            led.where(
                (F.col("date") < fy_eve)
                & ~is_balance_sheet()
                & forced_domain_filter(opts)
            )
            .groupBy(F.col("company_id").cast("string").alias("groupby"))
            .agg(
                F.sum(_debit()).cast("double").alias("debit"),
                F.sum(_credit()).cast("double").alias("credit"),
                F.sum("conv").cast("double").alias("balance"),
            )
            .select(
                F.lit(cg_key).alias("column_group_key"),
                F.lit("unaffected_earnings").alias("key"),
                "groupby", "debit", "credit", "balance",
                F.lit(None).cast("string").alias("max_date"),
            )
        )
        parts.append(unaff)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def gl_detail(led: DataFrame, options: dict) -> DataFrame:
    """Block 3: in-period detail lines with running balance seeded by
    the account's opening balance (pre-period rows; balance-sheet
    accounts only, like the 'normal'-scope initial balance)."""
    date_from = options["date"]["date_from"]
    opening = (
        led.where((F.col("date") < date_from) & is_balance_sheet())
        .groupBy("account_code")
        .agg(F.sum("conv").alias("opening"))
    )
    # (date, id) is not unique in the driver's generator (duplicate
    # order/line pairs); adding conv makes the order deterministic up to
    # identical rows, whose running balances are interchangeable anyway
    w = (
        W.partitionBy("account_code")
        .orderBy("date", "id", "conv")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    detail = led.where(date_scope_filter(options, "strict_range"))
    return (
        detail.join(opening, "account_code", "left")
        .select(
            "account_code",
            "id",
            F.date_format("date", "yyyy-MM-dd").alias("line_date"),
            F.col("conv").cast("double").alias("amount"),
            (F.coalesce(F.col("opening"), F.lit(0)) + F.sum("conv").over(w))
            .cast("double")
            .alias("running_balance"),
        )
    )

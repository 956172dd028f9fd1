"""Aging bucketization (J4/W5/A3).

The reference assigns aging buckets two ways:
- an interval join against a `(VALUES ...)` period table
  (`account_aged_partner_balance.py:127-133, 197-206`), and
- Python day-diff chains (`etl_stock/wizard/stock_ageing.py:160-170`).

Spark-first: a bucket is a pure expression over datediff — no join at
all (Catalyst folds the whole CASE chain into codegen), and the pivot
is conditional aggregation (`SUM(CASE WHEN bucket=i ...)`,
`account_aged_partner_balance.py:146-157`). At 100 TB this costs one
scan + one shuffle on the group key; an actual interval join would
re-shuffle and defeat partition pruning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The reference's 6 aging periods: current, 1-30, 31-60, 61-90, 91-120, older.
DEFAULT_BUCKETS = ((0, 30), (31, 60), (61, 90), (91, 120))


def age_days(as_of: Column | str, date_col: Column | str) -> Column:
    a = F.lit(as_of) if isinstance(as_of, str) else as_of
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.datediff(F.to_date(a), F.to_date(d))


def bucket_expr(
    days: Column,
    buckets: Sequence[tuple[int, int]] = DEFAULT_BUCKETS,
    current_label: str = "current",
    older_label: str = "older",
) -> Column:
    """Map elapsed days to a bucket label; days < first lo → current."""
    expr = F.when(days < buckets[0][0], F.lit(current_label))
    for lo, hi in buckets:
        expr = expr.when((days >= lo) & (days <= hi), F.lit(f"{lo}-{hi}"))
    return expr.otherwise(F.lit(older_label))


def bucket_pivot(
    df: DataFrame,
    group_by: Sequence[str],
    days: Column,
    amount: Column,
    buckets: Sequence[tuple[int, int]] = DEFAULT_BUCKETS,
) -> DataFrame:
    """Aged-balance pivot: one conditional-agg column per bucket
    (A3), exactly the reference's SUM(CASE WHEN period_index=i ...)."""
    aggs = [
        F.sum(
            F.when((days >= lo) & (days <= hi), amount).otherwise(F.lit(0)).cast(
                "decimal(30,2)"
            )
        )
        .cast("double")
        .alias(f"period_{lo}_{hi}")
        for lo, hi in buckets
    ]
    lo0 = buckets[0][0]
    hi_last = buckets[-1][1]
    aggs.insert(
        0,
        F.sum(F.when(days < lo0, amount).otherwise(F.lit(0)).cast("decimal(30,2)"))
        .cast("double")
        .alias("period_current"),
    )
    aggs.append(
        F.sum(F.when(days > hi_last, amount).otherwise(F.lit(0)).cast("decimal(30,2)"))
        .cast("double")
        .alias("period_older"),
    )
    aggs.append(
        F.sum(amount.cast("decimal(30,2)")).cast("double").alias("total")
    )
    return df.groupBy(*group_by).agg(*aggs)

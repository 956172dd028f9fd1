"""Aged receivable: the reference's aged-partner-balance shape
(`account_aged_partner_balance.py:127-221`) on the driver tables.

Mapping: orders are open invoices (due 30 days after order date);
partial payments are that order's line shipments up to the as-of date.
The reference's LEFT JOIN LATERAL per-line reconciled amount becomes a
pre-aggregated payments table left-joined on the order key (J3 — the
Catalyst-friendly decorrelation); the period VALUES-table theta join
becomes a bucket expression (J4); the residual pivot is a conditional
aggregate (A3); empty groups drop via HAVING (A5).

Scale: one aggregate over lineitem (shuffle on orderkey), one join to
orders on the same key, one aggregate on partner. No lateral, no
per-row subqueries, no theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_PERIODS = 6  # not-due, 1-30, 31-60, 61-90, 91-120, older


def bucket_index(days_col) -> F.Column:
    return (
        F.when(days_col <= 0, 0)
        .when(days_col <= 30, 1)
        .when(days_col <= 60, 2)
        .when(days_col <= 90, 3)
        .when(days_col <= 120, 4)
        .otherwise(5)
    )


def aged_receivable(
    orders: DataFrame, lineitem: DataFrame, as_of: str, due_days: int = 30
) -> DataFrame:
    paid = (
        lineitem.where(F.col("l_shipdate") <= f"{as_of} 23:59:59")
        .groupBy(F.col("l_orderkey").alias("pay_key"))
        .agg(
            F.sum(
                F.round(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    ),
                    2,
                )
            ).alias("paid")
        )
    )
    inv = orders.where(F.col("o_orderdate") <= f"{as_of} 23:59:59")
    due_date = F.date_add(F.col("o_orderdate").cast("date"), due_days)
    days_overdue = F.datediff(F.lit(as_of).cast("date"), due_date)
    joined = (
        inv.join(paid, inv.o_orderkey == paid.pay_key, "left")
        .withColumn(
            "residual",
            F.col("o_totalprice").cast("decimal(18,2)")
            - F.coalesce(F.col("paid"), F.lit(0).cast("decimal(18,2)")),
        )
        .withColumn("bucket", bucket_index(days_overdue))
    )
    periods = [
        F.sum(F.when(F.col("bucket") == i, F.col("residual")).otherwise(F.lit(0)))
        .cast("double")
        .alias(f"period{i}")
        for i in range(N_PERIODS)
    ]
    agg = joined.groupBy(F.col("o_custkey").alias("partner_id")).agg(
        F.count("*").alias("aml_count"),
        F.sum("residual").alias("total_dec"),
        *periods,
    )
    return (
        agg.where(F.col("total_dec") != 0)
        .select(
            "partner_id",
            "aml_count",
            *[f"period{i}" for i in range(N_PERIODS)],
            F.col("total_dec").cast("double").alias("total"),
        )
    )

"""S4/3.3: the Excel-register pipeline shape — filter → join lines →
per-invoice aggregate → pivot by tax group → grand-total row.

The reference builds these row-by-row in Python and writes xlwt cells
(`etl_account/wizard/sales_report.py:44-236`); the pipeline here is the
same report as one DataFrame: the pivot is a conditional aggregate per
group (A3), the totals row a heterogeneous union (U2). Rendering to a
file is the sink's job (:mod:`.sinks`), not the query's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RETURN_FLAGS = ("A", "N", "R")


def sales_register(
    orders: DataFrame, lineitem: DataFrame, date_from: str, date_to: str
) -> DataFrame:
    inv = orders.where(
        (F.col("o_orderdate") >= date_from)
        & (F.col("o_orderdate") <= f"{date_to} 23:59:59")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = lineitem.select(
        "l_orderkey",
        "l_quantity",
        "l_returnflag",
        F.round(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"), 2
        ).alias("net"),
    )
    joined = inv.join(li, inv.o_orderkey == li.l_orderkey)
    flag_cols = [
        F.sum(
            F.when(F.col("l_returnflag") == flag, F.col("net")).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        ).alias(f"amount_{flag}")
        for flag in RETURN_FLAGS
    ]
    # all sums stay in exact decimal until the output edge, so the
    # grand-total row is independent of summation order
    per_invoice = joined.groupBy("o_orderkey", "o_custkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"),
        F.sum("net").alias("net_dec"),
        *flag_cols,
    )
    detail = per_invoice.select(
        F.col("o_orderkey").cast("string").alias("invoice"),
        F.col("o_custkey").cast("string").alias("partner"),
        F.col("qty_dec").cast("double").alias("total_qty"),
        F.col("net_dec").cast("double").alias("net_total"),
        *[F.col(f"amount_{f}").cast("double").alias(f"amount_{f}") for f in RETURN_FLAGS],
    )
    totals = per_invoice.agg(
        F.sum("qty_dec").alias("qty_dec"),
        F.sum("net_dec").alias("net_dec"),
        *[F.sum(f"amount_{f}").alias(f"amount_{f}") for f in RETURN_FLAGS],
    ).select(
        F.lit("__TOTAL__").alias("invoice"),
        F.lit(None).cast("string").alias("partner"),
        F.col("qty_dec").cast("double").alias("total_qty"),
        F.col("net_dec").cast("double").alias("net_total"),
        *[F.col(f"amount_{f}").cast("double").alias(f"amount_{f}") for f in RETURN_FLAGS],
    )
    return detail.unionByName(totals)

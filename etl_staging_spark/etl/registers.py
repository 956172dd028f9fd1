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


TAX_BUCKETS = (("low", 0, 2), ("mid", 3, 5), ("high", 6, 8))


def purchase_register(
    orders: DataFrame, lineitem: DataFrame, date_from: str, date_to: str
) -> DataFrame:
    """The purchase-register pivot (`etl_account/wizard/purchase_report.py:
    44-198`): per (bill, vendor) quantities/net plus the per-rate tax
    pivot (the reference's CGST/SGST-by-rate columns; rates bucket into
    low/mid/high percent bands here) and a grand-total row. Tax stays
    exact: rate as DECIMAL(4,2), per-row ROUND(net * rate, 2)."""
    inv = orders.where(
        (F.col("o_orderdate") >= date_from)
        & (F.col("o_orderdate") <= f"{date_to} 23:59:59")
    ).select("o_orderkey")
    rate = F.col("l_tax").cast("decimal(4,2)")
    net = F.round(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"), 2
    )
    li = lineitem.select(
        "l_orderkey",
        F.col("l_suppkey").alias("vendor_id"),
        "l_quantity",
        (F.round(rate * 100).cast("int")).alias("rate_pct"),
        net.alias("net"),
        F.round(net * rate, 2).alias("tax_amt"),
    )
    joined = inv.join(li, inv.o_orderkey == li.l_orderkey)
    bucket_cols = [
        F.sum(
            F.when(
                F.col("rate_pct").between(lo, hi), F.col("tax_amt")
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        ).alias(f"tax_{name}")
        for name, lo, hi in TAX_BUCKETS
    ]
    per_bill = joined.groupBy("o_orderkey", "vendor_id").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"),
        F.sum("net").alias("net_dec"),
        F.sum("tax_amt").alias("tax_dec"),
        *bucket_cols,
    )
    names = [n for n, _, _ in TAX_BUCKETS]
    detail = per_bill.select(
        F.col("o_orderkey").cast("string").alias("bill"),
        F.col("vendor_id").cast("string").alias("vendor"),
        F.col("qty_dec").cast("double").alias("total_qty"),
        F.col("net_dec").cast("double").alias("net_total"),
        F.col("tax_dec").cast("double").alias("tax_total"),
        *[F.col(f"tax_{n}").cast("double").alias(f"tax_{n}") for n in names],
    )
    totals = per_bill.agg(
        F.sum("qty_dec").alias("qty_dec"),
        F.sum("net_dec").alias("net_dec"),
        F.sum("tax_dec").alias("tax_dec"),
        *[F.sum(f"tax_{n}").alias(f"tax_{n}") for n in names],
    ).select(
        F.lit("__TOTAL__").alias("bill"),
        F.lit(None).cast("string").alias("vendor"),
        F.col("qty_dec").cast("double").alias("total_qty"),
        F.col("net_dec").cast("double").alias("net_total"),
        F.col("tax_dec").cast("double").alias("tax_total"),
        *[F.col(f"tax_{n}").cast("double").alias(f"tax_{n}") for n in names],
    )
    return detail.unionByName(totals)


def hsn_summary(
    orders: DataFrame, lineitem: DataFrame, part: DataFrame, date_from: str, date_to: str
) -> DataFrame:
    """The HSN summary (`etl_account/wizard/hsn_report.py:37-...`):
    invoice lines grouped by the product's HSN classification (the part
    type here), with line counts, quantities, taxable value, tax and
    gross, plus a grand-total row."""
    inv = orders.where(
        (F.col("o_orderdate") >= date_from)
        & (F.col("o_orderdate") <= f"{date_to} 23:59:59")
    ).select("o_orderkey")
    rate = F.col("l_tax").cast("decimal(4,2)")
    li = lineitem.select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        F.round(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)"), 2
        ).alias("net"),
        rate.alias("rate"),
    ).withColumn("tax_amt", F.round(F.col("net") * F.col("rate"), 2))
    p = part.select("p_partkey", F.col("p_type").alias("hsn_class"))
    joined = (
        inv.join(li, inv.o_orderkey == li.l_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
    )
    per_class = joined.groupBy("hsn_class").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"),
        F.sum("net").alias("taxable_dec"),
        F.sum("tax_amt").alias("tax_dec"),
    )
    # Output edge is DOUBLE, matching every other register: internal sums
    # are exact decimal (scale 2), so the decimal->double conversion is the
    # proven dsum convention — the same shape sales/purchase registers use.
    dec = "double"
    detail = per_class.select(
        "hsn_class",
        "n_lines",
        F.col("qty_dec").cast(dec).alias("total_qty"),
        F.col("taxable_dec").cast(dec).alias("taxable_value"),
        F.col("tax_dec").cast(dec).alias("tax_amount"),
        (F.col("taxable_dec") + F.col("tax_dec")).cast(dec).alias("gross"),
    )
    totals = per_class.agg(
        F.sum("n_lines").alias("n_lines"),
        F.sum("qty_dec").alias("qty_dec"),
        F.sum("taxable_dec").alias("taxable_dec"),
        F.sum("tax_dec").alias("tax_dec"),
    ).select(
        F.lit("__TOTAL__").alias("hsn_class"),
        "n_lines",
        F.col("qty_dec").cast(dec).alias("total_qty"),
        F.col("taxable_dec").cast(dec).alias("taxable_value"),
        F.col("tax_dec").cast(dec).alias("tax_amount"),
        (F.col("taxable_dec") + F.col("tax_dec")).cast(dec).alias("gross"),
    )
    return detail.unionByName(totals)

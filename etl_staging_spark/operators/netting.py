"""Ledger netting (A9): on-hand = Σ IN − Σ OUT per key, optional as-of.

Reference: `etl_stock/models/product.py:34-156` nets qty_done into a
location minus qty_done out of it per product×lot; the Python there
loops per product — here it is one signed aggregation: tag each row
±1 and sum once. One shuffle on the group key, map-side partial
aggregation, no self-join, no driver loop — the shape that survives
100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def net_ledger(
    df: DataFrame,
    keys: Sequence[str],
    qty: Column | str,
    is_in: Column,
    is_out: Column,
    as_of: Column | None = None,
    date_col: str | None = None,
    scale: int = 3,
) -> DataFrame:
    """Signed-sum netting. Rows matching neither predicate contribute 0;
    rows after ``as_of`` are excluded (as-of stock levels)."""
    q = F.col(qty) if isinstance(qty, str) else qty
    if as_of is not None:
        df = df.where(F.col(date_col) <= as_of)
    signed = (
        F.when(is_in, q).when(is_out, -q).otherwise(F.lit(0)).cast(f"decimal(30,{scale})")
    )
    qty_in = F.when(is_in, q).otherwise(F.lit(0)).cast(f"decimal(30,{scale})")
    qty_out = F.when(is_out, q).otherwise(F.lit(0)).cast(f"decimal(30,{scale})")
    return df.groupBy(*keys).agg(
        F.sum(qty_in).cast("double").alias("qty_in"),
        F.sum(qty_out).cast("double").alias("qty_out"),
        F.sum(signed).cast("double").alias("qty_net"),
    )

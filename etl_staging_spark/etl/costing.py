"""M2: SVL as-of valuation costing (`etl_stock/models/svl.py:181-242`).

The reference walks every OUT layer row-by-row in Python and, per row,
re-queries all prior IN layers: use the single prior's unit cost when
there is exactly one, else a weighted average over all priors (rounded
to 3 dp), else 0; then value = round(unit_cost * qty, 2).

Spark shape: union IN and OUT layers and compute, per product key, ONE
window pass with a RANGE frame over *days* ending strictly before the
current row's date (the reference's ``create_date < date`` predicate —
range-by-value, so same-day rows never see each other and ordering ties
cannot perturb results):

- n_priors  — count of prior IN rows
- single prior  → MIN(prior unit_cost) (equals "the" prior's cost)
- multiple priors → ROUND(Σ prior value / Σ prior qty, 3) over rows
  with unit_cost > 0, exact-decimal sums

One shuffle on the product key; linear in rows — the reference's
per-row re-query is O(n²) per product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

EPOCH = "1970-01-01"


def svl_costing(layers: DataFrame) -> DataFrame:
    """``layers``: (part_key, layer_date date, is_in boolean,
    qty decimal, unit_cost decimal — meaningful on IN rows,
    value decimal — meaningful on IN rows). Returns the OUT rows with
    computed unit_cost and value."""
    day = F.datediff(F.col("layer_date"), F.lit(EPOCH).cast("date"))
    base = layers.withColumn("__day", day)
    prior = (
        W.partitionBy("part_key")
        .orderBy("__day")
        .rangeBetween(W.unboundedPreceding, -1)
    )
    in_cost = F.when(F.col("is_in"), F.col("unit_cost"))
    pos_val = F.when(F.col("is_in") & (F.col("unit_cost") > 0), F.col("value"))
    pos_qty = F.when(F.col("is_in") & (F.col("unit_cost") > 0), F.col("qty"))
    enriched = base.select(
        "*",
        F.count(in_cost).over(prior).alias("__n_priors"),
        F.min(in_cost).over(prior).alias("__single_cost"),
        F.sum(pos_val).over(prior).alias("__val_sum"),
        F.sum(pos_qty).over(prior).alias("__qty_sum"),
    )
    # floor(x*1000 + 0.5)/1000: 3-dp half-up rounding in pure IEEE ops —
    # engine-independent, unlike round(double, 3) whose half-way
    # handling differs between Spark (decimal-string) and DuckDB (binary)
    ratio = F.col("__val_sum").cast("double") / F.col("__qty_sum").cast("double")
    unit_cost = (
        F.when(F.col("__n_priors") == 1, F.col("__single_cost").cast("double"))
        .when(
            (F.col("__n_priors") > 1) & (F.col("__qty_sum") > 0),
            F.floor(ratio * 1000 + 0.5) / 1000,
        )
        .otherwise(F.lit(0.0))
    )
    out = enriched.where(~F.col("is_in")).withColumn("out_unit_cost", unit_cost)
    value = F.round(
        F.col("out_unit_cost").cast("decimal(18,6)") * F.col("qty").cast("decimal(18,2)"),
        2,
    )
    return out.select(
        "part_key",
        F.date_format("layer_date", "yyyy-MM-dd").alias("out_date"),
        F.col("qty").cast("double").alias("out_qty"),
        "out_unit_cost",
        value.cast("double").alias("out_value"),
    )

"""As-of lookups (J7/W3/C4): "latest value at or before t" family.

The reference computes out-layer costs as the latest prior in-layer's
unit cost (order by create_date desc limit 1) with a weighted-average
fallback (`etl_stock/models/svl.py:205-240`), and reconstructs audit
history as the last old_value before t (`smile_audit/models/base.py:13-44`).

Spark-first design: both are window functions over the fact itself —
no per-row subquery, no lateral. At 100 TB the window shuffles once on
the partition keys and streams sorted runs; skewed entities are split
by AQE. For joining two *different* streams as-of (trade/quote style),
``asof_join`` unions the two sides with a side marker and applies the
same last-non-null window — one shuffle, no N×M join blowup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def last_before(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    out_col: str = "prev_value",
    strict: bool = True,
) -> DataFrame:
    """Attach the latest prior ``value_col`` within each partition.

    ``strict=True`` looks at rows strictly before the current one
    (the SVL "latest prior in-layer" semantics); ``False`` includes the
    current row (time-travel "as of now" semantics).
    """
    upper = -1 if strict else 0
    w = (
        W.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(W.unboundedPreceding, upper)
    )
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` per ``on`` key — without a range join.

    ``right`` must expose ``value_cols`` under names that don't collide
    with ``left``'s columns (rename before calling). ``tiebreak`` names
    a right column ordering simultaneous right rows (later wins).

    Implementation: tag both sides, union on (keys, ts), run one
    last-non-null window, keep left rows. One shuffle on the keys;
    scales linearly where a naive per-key range join is quadratic.
    """
    on = list(on)
    value_cols = list(value_cols)
    r_extra = value_cols + ([tiebreak] if tiebreak and tiebreak not in value_cols else [])
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = right.select(*on, F.col(right_ts).alias("__ts"), *r_extra).withColumn(
        "__side", F.lit(0)
    )
    l_only = [c for c in left.columns if c not in on]
    merged = lt.select(
        *on,
        *l_only,
        "__ts",
        "__side",
        *[F.lit(None).cast(rt.schema[v].dataType).alias(v) for v in r_extra],
    ).unionByName(
        rt.select(
            *on,
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_only],
            "__ts",
            "__side",
            *r_extra,
        )
    )
    # right rows sort before left rows at equal ts => "<=" semantics
    order = ["__ts", "__side"] + ([tiebreak] if tiebreak else [])
    w = W.partitionBy(*on).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    # Wrap each right value in a struct: the struct is non-null whenever a
    # right ROW exists, even if the value itself is NULL — so the latest
    # right row's NULL is returned (ORDER BY ts DESC LIMIT 1 semantics),
    # not an older non-null value.
    picked = merged.select(
        *merged.columns,
        *[
            F.last(
                F.when(F.col("__side") == 0, F.struct(F.col(v).alias("v"))),
                ignorenulls=True,
            )
            .over(w)
            .alias(f"__asof_{v}")
            for v in value_cols
        ],
    )
    out = picked.where(F.col("__side") == 1)
    for v in value_cols:
        out = out.withColumn(v, F.col(f"__asof_{v}.v"))
    drop = ["__ts", "__side"] + [f"__asof_{v}" for v in value_cols]
    if tiebreak and tiebreak not in value_cols:
        drop.append(tiebreak)
    return out.drop(*drop)


def most_recent_value(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """W3: keep the single most-recent row per partition
    (`account_report.py:2906-2912` — GROUP BY date ORDER BY date DESC LIMIT 1)."""
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

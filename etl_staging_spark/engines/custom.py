"""E5: the custom engine — named handler dispatch.

The reference resolves ``_report_custom_engine_<formula>`` by name with
signature validation (`account_report.py:2945-2953, 1744-1760`); every
complex report (aged, multicurrency, executive summary) plugs in this
way. Here the registry maps formula names to DataFrame builders with
the same calling convention as the batchable engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

CUSTOM_ENGINES: dict[str, Callable] = {}


def custom_engine(name: str):
    """Decorator: register ``fn(led, options, date_scope, groupby)``."""

    def deco(fn):
        CUSTOM_ENGINES[name] = fn
        return fn

    return deco


def dispatch(
    name: str, led: DataFrame, options: dict, date_scope: str = "strict_range",
    groupby: str | None = None,
) -> DataFrame:
    if name not in CUSTOM_ENGINES:
        raise KeyError(
            f"no custom engine {name!r}; registered: {sorted(CUSTOM_ENGINES)}"
        )
    return CUSTOM_ENGINES[name](led, options, date_scope, groupby)


@custom_engine("top_partners")
def _top_partners(led: DataFrame, options: dict, date_scope: str, groupby):
    """Example handler: top-5 partners by converted balance in the
    period (deterministic tie-break on partner_id)."""
    from pyspark.sql import functions as F

    from .options import date_scope_filter

    sums = (
        led.where(date_scope_filter(options, date_scope))
        .groupBy("partner_id")
        .agg(F.sum("conv").alias("dsum"))
    )
    return (
        sums.orderBy(F.desc("dsum"), F.asc("partner_id"))
        .limit(5)
        .select("partner_id", F.col("dsum").cast("double").alias("balance"))
    )

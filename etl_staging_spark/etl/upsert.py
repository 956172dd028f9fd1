"""S3/M3: master upserts and dedup/purge jobs.

- ``scd0_upsert``: the reference's lookup-or-create keyed on code
  (`etl_stock/models/company.py:1262-1371`): existing master rows are
  NEVER modified (SCD type 0); only genuinely new keys append. One
  anti-join + union — the incoming side is usually small (a CSV batch),
  so it broadcasts.
- ``dedup_purge``: `delete_duplicates` (`:1186-1195`) — keep one
  deterministic survivor per natural key (min of the ordering column),
  expressed as an aggregation, not row-at-a-time deletes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd0_upsert(master: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """Master stays authoritative; new keys append with is_new=true."""
    new_rows = incoming.join(master.select(key), key, "left_anti")
    return (
        master.withColumn("is_new", F.lit(False))
        .unionByName(new_rows.withColumn("is_new", F.lit(True)))
    )


def dedup_purge(
    df: DataFrame, natural_key: Sequence[str], order_col: str
) -> DataFrame:
    """One survivor per natural key: the row with the MIN order_col
    (ties collapse to the same value, so the survivor is well-defined
    as a value even when row identity is ambiguous)."""
    return df.groupBy(*natural_key).agg(
        F.count("*").alias("n_dups"),
        F.min(order_col).alias(f"kept_{order_col}"),
    )

"""Hierarchy rollup: account.group parent-chain totals above grouped
lines (reference `account_reports/models/account_report.py:845-993`,
``_create_hierarchy``).

Two layers, split by where the data size lives:

- :func:`hierarchy_rollup` — the DATA-sized part in Spark: ONE
  per-account aggregate over the scoped ledger (shuffle bounded by the
  account dimension), then one tiny aggregate per hierarchy level over
  the per-account frame (prefix groupBy — Catalyst reuses the cached
  per-account exchange). Output is (path, depth, line_type, totals) rows
  whose lexicographic path order IS the depth-first tree order (a
  group's prefix sorts immediately before its members), so no driver
  recursion touches anything O(accounts).
- :func:`etl_staging_spark.reports.assemble.create_hierarchy` — the
  REPORT-sized part in Python: renders assembled account lines into the
  group tree with rolled-up column totals, '(No Group)' handling and
  parent-chain levels, exactly like the reference (O(report lines)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hierarchy_rollup(per_acct: DataFrame, levels: tuple[int, ...] = (1, 2)) -> DataFrame:
    """Roll per-account totals up a prefix-defined group tree.

    ``per_acct``: (account_code string, total decimal, n_lines long) —
    already one row per account. ``levels``: the prefix lengths that
    define the group levels (1 = '1xx' class, 2 = '10x' group, ...).

    Returns one row per account plus one per group node:
    (path, depth, line_type, total, n_accounts). Paths nest by prefix,
    so ORDER BY path renders the tree depth-first."""
    acct = per_acct.select(
        F.col("account_code").alias("path"),
        F.lit(len(levels)).cast("int").alias("depth"),
        F.lit("account").alias("line_type"),
        F.col("total"),
        F.lit(1).cast("bigint").alias("n_accounts"),
    )
    out = acct
    for depth, lv in enumerate(levels):
        grp = (
            per_acct.groupBy(F.substring("account_code", 1, lv).alias("path"))
            .agg(
                F.sum("total").alias("total"),
                F.count("*").alias("n_accounts"),
            )
            .select(
                "path",
                F.lit(depth).cast("int").alias("depth"),
                F.lit(f"group{lv}").alias("line_type"),
                "total",
                "n_accounts",
            )
        )
        out = out.unionByName(grp)
    return out

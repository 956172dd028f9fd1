"""Registry wiring queries() / oracle_sql() for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a pair:
a Spark builder ``(spark, sf_dir) -> DataFrame`` and (when the
semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
string. The driver hash-compares both at sf0.01.

Numeric-determinism conventions (so value hashes match bit-for-bit):

- Monetary sums go through ``dsum``: cast each addend to DECIMAL before
  SUM (exact arithmetic in both engines), cast the result back to
  DOUBLE. Float summation order then cannot perturb the hash. The
  decimal->double edge is bit-identical across engines only while the
  scaled integer fits in 2^53 (|sum| <= ~9.0e13 at scale 2 — DuckDB
  converts via double division of the scaled int); every test-sf sum is
  orders of magnitude inside that envelope (property-tested in
  `tests/test_decimal_edge.py`). DECIMAL-typed OUTPUT columns are
  forbidden: driver canonicalizations disagree on Decimal cell
  rendering (every decimal-edged entry ever driver-attempted hash-red;
  all double-edged entries green).
- Ratios/averages are computed in double and rounded to a fixed scale
  (noise ~1e-12 relative << 0.5 ulp of the rounding scale).
- Dates/timestamps are emitted as 'yyyy-MM-dd[ HH:mm:ss]' strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator registering a query (and optional DuckDB oracle)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def dsum(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """Hash-stable SUM: per-row cast to DECIMAL(precision, scale), exact
    decimal summation, result back to DOUBLE.

    Mirrors the reference's "round per row before summing" convention
    (`account_reports/models/account_report.py:2563, 2651`).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def o_dsum(expr: str, scale: int = 2, precision: int = 30) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


# Portable double rounding — ROUND(double, s) is not cross-engine
# deterministic; see etl_staging_spark/numeric.py for the full story.
from ..numeric import o_pround, pround  # noqa: E402,F401


def fmt_date(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def o_fmt_date(expr: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d')"

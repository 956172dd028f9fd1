"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are assembled from the registry in
``etl_staging_spark.queries`` — every implemented operator from
SURVEY.md §2 registers a Spark builder and (when SQL-expressible) a
DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

# Import catalog modules for their registration side effects.
from etl_staging_spark.queries import registry  # noqa: E402
from etl_staging_spark.queries import catalog_core  # noqa: E402,F401
from etl_staging_spark.queries import catalog_joins  # noqa: E402,F401
from etl_staging_spark.queries import catalog_llm  # noqa: E402,F401
from etl_staging_spark.queries import catalog_engines  # noqa: E402,F401
from etl_staging_spark.queries import catalog_reports  # noqa: E402,F401
from etl_staging_spark.queries import catalog_audit  # noqa: E402,F401
from etl_staging_spark.queries import catalog_dashboards  # noqa: E402,F401
from etl_staging_spark.queries import catalog_etl  # noqa: E402,F401
from etl_staging_spark.queries import catalog_hierarchy  # noqa: E402,F401
from etl_staging_spark.queries import catalog_misc  # noqa: E402,F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the star-join revenue
    rollup (GL-style dim joins + currency rounding + hash agg)."""
    return registry.QUERIES["j1_star_join_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)

"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over unilever_scraping_etl_spark.plans.registry — every
operator from SURVEY.md §2 registers there with its Spark plan and
(when SQL-expressible) a DuckDB oracle; see that module for the
cross-engine determinism rules (aliasing, float rounding, tiebreaks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from unilever_scraping_etl_spark.plans.registry import (oracle_queries,
                                                        spark_queries)

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return spark_queries()["agg_price_stats"](spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (omitted for approx/LSH/ANN
    ops, which get the driver's rows-only check)."""
    return oracle_queries()

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship structured query (the README's
"mean power over time buckets" shape) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with
DuckDB oracles (see ecollector_spark.driver_queries).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ecollector_spark import driver_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    driver_queries.load_all()
    return driver_queries.QUERIES["ts_group_by_time_mean"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    driver_queries.load_all()
    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    driver_queries.load_all()
    return dict(driver_queries.ORACLES)

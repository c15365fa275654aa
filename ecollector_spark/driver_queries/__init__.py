"""Registry of driver-checked queries.

Each entry pairs a Spark query builder ``(spark, sf_dir) -> DataFrame``
with (usually) an equivalent DuckDB SQL oracle over the same parquet
tables. The driver runs both at sf0.01 and compares row count, schema and
an order-insensitive value hash — so builders and oracles must agree on
column *names* and produce deterministic values (aggregates over doubles
are rounded or computed in exact decimal on both sides).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all query modules (idempotent)."""
    from ecollector_spark.driver_queries import (  # noqa: F401
        asof_q,
        cascade,
        core,
        planner_extra,
        sessionize,
        sketches_q,
        streaming_q,
        transform_q,
    )

    try:
        from ecollector_spark.driver_queries import tpch  # noqa: F401
    except ImportError:
        pass
    try:
        from ecollector_spark.driver_queries import datapipe  # noqa: F401
    except ImportError:
        pass

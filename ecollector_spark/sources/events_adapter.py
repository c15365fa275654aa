"""Adapter: the driver's synthetic ``events`` table viewed as canonical
datapoints (FIXTURES.md §3 maps events -> §1 fimp input).

The mapping is deterministic and expression-only so the DuckDB oracle can
reproduce it exactly (``EVENTS_DP_SQL`` is the SQL twin — keep the two in
lockstep). event_type plays the measurement/service, user_id the device.

This is also the pattern a production deployment uses to bring an existing
event stream into the engine: a single declarative select, no UDFs, fully
codegen'd, safe at any scale because it adds no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecollector_spark.session import read_parquet


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet with ``ts`` as a proper TimestampType.

    The file stores TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` Spark reads it as long nanos,
    which we floor-truncate to microseconds — the same truncation DuckDB
    applies reading nanos into its native µs timestamps, so both engines
    see identical instants.
    """
    # The driver harness hands us a *vanilla* SparkSession, so the nanos
    # legacy flag must be set at runtime here — it is a runtime-settable
    # SQLConf, not a builder-only one.  Without it the read dies with
    # PARQUET_TYPE_ILLEGAL: INT64 (TIMESTAMP(NANOS)).
    # The session timezone is pinned for the same reason: downstream
    # date_trunc/date_format results must match the DuckDB oracle, which
    # treats naive parquet timestamps as UTC — a vanilla session on a
    # non-UTC host would silently shift every local-time rendering.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # older/newer Spark without the conf: fall through to the read
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev


#: The datapoints projection as SQL fragments: one ``selectExpr`` call
#: marshals the whole list in a single py4j round-trip (the Column-builder
#: form cost ~120 round-trips per invocation, and this adapter fronts
#: every ts-family query build). Expression trees are identical — the
#: fragments parse to the same Catalyst nodes the Column API built.
_DP_EXPRS = (
    "event_type AS measurement",
    "ts AS ts",
    "concat_ws(';', event_type, CAST(user_id AS STRING), 'import') AS series_id",
    "CAST(user_id AS STRING) AS dev_id",
    "CASE WHEN (user_id % 3) = 0 THEN 'meter.main_elec' ELSE 'sensor.generic' END"
    " AS dev_type",
    "'import' AS dir",
    "CAST(user_id % 5 AS STRING) AS location_id",
    "event_type AS service",
    "'driver' AS src",
    "concat('pt:j1/mt:evt/rt:dev/rn:test/ad:1/sv:', event_type, '/ad:',"
    " CAST(user_id AS STRING)) AS topic",
    "'site1' AS domain",
    "value AS value_f",
    "CAST(NULL AS BOOLEAN) AS value_b",
    "CAST(NULL AS STRING) AS value_s",
    "'W' AS unit",
    "'mean' AS agg_func",
    "'gen_raw' AS tier",
)


def events_as_datapoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events(spark, sf_dir)
    return ev.selectExpr(*_DP_EXPRS)


#: DuckDB twin of :func:`events_as_datapoints` (a CTE body over view `events`)
EVENTS_DP_SQL = """
SELECT
  event_type AS measurement,
  ts,
  event_type || ';' || CAST(user_id AS VARCHAR) || ';import' AS series_id,
  CAST(user_id AS VARCHAR) AS dev_id,
  CASE WHEN user_id % 3 = 0 THEN 'meter.main_elec' ELSE 'sensor.generic' END AS dev_type,
  'import' AS dir,
  CAST(user_id % 5 AS VARCHAR) AS location_id,
  event_type AS service,
  'driver' AS src,
  'pt:j1/mt:evt/rt:dev/rn:test/ad:1/sv:' || event_type || '/ad:' || CAST(user_id AS VARCHAR) AS topic,
  'site1' AS domain,
  value AS value_f,
  CAST(NULL AS BOOLEAN) AS value_b,
  CAST(NULL AS VARCHAR) AS value_s,
  'W' AS unit,
  'mean' AS agg_func,
  'gen_raw' AS tier
FROM events
"""

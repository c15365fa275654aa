"""Driver queries for the downsampling cascade (A20) and the hour
re-attribution time rewrite (A9) — the two SURVEY §2 operators not yet
pinned by a DuckDB oracle (they were test-only before).

Both run over a canonical datapoint view derived from ``events`` with
identical expressions on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecollector_spark.aggregate import hour_reattribution
from ecollector_spark.downsample import downsample_step
from ecollector_spark.driver_queries import register
from ecollector_spark.sources.events_adapter import read_events


def _dp_view(spark, sf_dir):
    """events -> minimal canonical datapoints: measurement = event_type,
    one series per (event_type, user_id%7)."""
    ev = read_events(spark, sf_dir)
    dev = (F.col("user_id") % 7).cast("string")
    return ev.select(
        F.col("event_type").alias("measurement"),
        F.col("ts"),
        F.concat(F.col("event_type"), F.lit(";"), dev).alias("series_id"),
        dev.alias("dev_id"),
        F.lit("sensor.generic").alias("dev_type"),
        F.lit("import").alias("dir"),
        (F.col("user_id") % 3).cast("string").alias("location_id"),
        F.col("event_type").alias("service"),
        F.lit("drv").alias("src"),
        F.concat(F.lit("t/"), dev).alias("topic"),
        F.lit("site").alias("domain"),
        F.col("value").alias("value_f"),
        F.lit("W").alias("unit"),
    )


_DP_SQL = """dp AS (
  SELECT event_type AS measurement, ts,
         event_type || ';' || CAST(user_id % 7 AS VARCHAR) AS series_id,
         CAST(user_id % 7 AS VARCHAR) AS dev_id,
         'sensor.generic' AS dev_type, 'import' AS dir,
         CAST(user_id % 3 AS VARCHAR) AS location_id,
         event_type AS service, 'drv' AS src,
         't/' || CAST(user_id % 7 AS VARCHAR) AS topic, 'site' AS domain,
         value AS value_f, 'W' AS unit
  FROM events)"""


@register(
    "downsample_cascade_10m",
    f"""WITH {_DP_SQL}
SELECT measurement, dev_id, dev_type, dir, location_id, service, topic, domain,
       CAST(floor(epoch(ts)/600) AS BIGINT)*600 AS time,
       round(avg(value_f), 6) AS value,
       min(series_id) AS series_id, min(unit) AS unit
FROM dp
GROUP BY measurement, dev_id, dev_type, dir, location_id, service, topic, domain,
         CAST(floor(epoch(ts)/600) AS BIGINT)*600
ORDER BY measurement, dev_id, time
""",
)
def downsample_cascade_10m(spark, sf_dir):
    """A20 CQ step: mean of value per (measurement, all tags, 10m bucket)
    — the gen_day -> gen_week cascade job, oracle-matched."""
    dp = _dp_view(spark, sf_dir)
    out = downsample_step(dp, "10m", target_tier=None)
    return out.select(
        "measurement", "dev_id", "dev_type", "dir", "location_id", "service",
        "topic", "domain",
        F.unix_timestamp("ts").alias("time"),
        F.round("value_f", 6).alias("value"),
        "series_id", "unit",
    )


@register(
    "hour_reattribution",
    """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS time,
       CAST(epoch(date_trunc('hour', ts - INTERVAL 1 HOUR) + INTERVAL 59 MINUTE) AS BIGINT)
         AS adjusted_time
FROM events WHERE user_id % 97 = 0
ORDER BY user_id, time
""",
)
def hour_reattribution_q(spark, sf_dir):
    """A9: HAN main-meter samples re-stamped to the previous hour :59
    (agreggator.go:307-310) as a column rewrite."""
    ev = read_events(spark, sf_dir).where(F.col("user_id") % 97 == 0)
    return ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_timestamp("ts").alias("time"),
        F.unix_timestamp(hour_reattribution(F.col("ts"))).alias("adjusted_time"),
    )

"""Driver queries for the time-series join operators (as-of, interval).

DuckDB has a native ASOF JOIN — the strongest possible oracle for our
union+window formulation; the interval join checks against a plain
inequality join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecollector_spark.driver_queries import register
from ecollector_spark.operators.joins import asof_join, interval_join
from ecollector_spark.sources.events_adapter import read_events


def _clicks(spark, sf_dir):
    return (
        read_events(spark, sf_dir)
        .where((F.col("event_type") == "click") & (F.col("user_id") % 21 == 0))
        .select("user_id", "ts", F.col("value").alias("click_value"))
    )


def _purchases(spark, sf_dir):
    return (
        read_events(spark, sf_dir)
        .where((F.col("event_type") == "purchase") & (F.col("user_id") % 21 == 0))
        .select("user_id", "ts", F.col("value").alias("purchase_value"))
    )


@register(
    "asof_join_last_purchase",
    """
WITH c AS (SELECT user_id, ts, value AS click_value FROM events
           WHERE event_type='click' AND user_id % 21 = 0),
p AS (SELECT user_id, ts, value AS purchase_value FROM events
      WHERE event_type='purchase' AND user_id % 21 = 0)
SELECT CAST(c.user_id AS BIGINT) AS user_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS time,
       round(c.click_value, 6) AS click_value,
       round(p.purchase_value, 6) AS purchase_value_asof
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
ORDER BY user_id, time, click_value
""",
)
def asof_join_last_purchase(spark, sf_dir):
    """As-of join: each click annotated with the user's most recent
    purchase value at-or-before it — checked against DuckDB's NATIVE
    ASOF JOIN."""
    j = asof_join(
        _clicks(spark, sf_dir),
        _purchases(spark, sf_dir),
        by=["user_id"],
        right_values=["purchase_value"],
    )
    return j.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_timestamp("ts").alias("time"),
        F.round("click_value", 6).alias("click_value"),
        F.round("purchase_value_asof", 6).alias("purchase_value_asof"),
    )


@register(
    "interval_join_post_purchase",
    """
WITH c AS (SELECT user_id, ts, value AS click_value FROM events
           WHERE event_type='click' AND user_id % 21 = 0),
iv AS (SELECT user_id, ts AS start_ts, ts + INTERVAL 72 HOUR AS end_ts,
              value AS purchase_value
       FROM events WHERE event_type='purchase' AND user_id % 21 = 0)
SELECT CAST(c.user_id AS BIGINT) AS user_id,
       CAST(floor(epoch(c.ts)) AS BIGINT) AS time,
       CAST(floor(epoch(iv.start_ts)) AS BIGINT) AS window_start,
       round(c.click_value, 6) AS click_value,
       round(iv.purchase_value, 6) AS purchase_value
FROM c JOIN iv ON c.user_id = iv.user_id
              AND c.ts >= iv.start_ts AND c.ts < iv.end_ts
ORDER BY user_id, time, window_start
""",
)
def interval_join_post_purchase(spark, sf_dir):
    """Interval join: clicks falling in the 72 h window after each
    purchase (bucketed equi-join, no nested-loop)."""
    iv = _purchases(spark, sf_dir).select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 72 HOURS")).alias("end_ts"),
        "purchase_value",
    )
    j = interval_join(
        _clicks(spark, sf_dir),
        iv,
        by=["user_id"],
        ts_col="ts",
        start_col="start_ts",
        end_col="end_ts",
        bucket_seconds=3600,
    )
    return j.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_timestamp("ts").alias("time"),
        F.unix_timestamp("start_ts").alias("window_start"),
        F.round("click_value", 6).alias("click_value"),
        F.round("purchase_value", 6).alias("purchase_value"),
    )

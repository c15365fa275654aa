"""Sessionization — a windowing capability beyond the reference
(SURVEY §2.8: the reference has tumbling windows only) that every
training-data / clickstream pipeline needs: group events into sessions
separated by >= gap of inactivity.

Spark-first: ``F.session_window`` (merging state windows, streaming-
capable) — the oracle is the classic gaps-and-islands rewrite (lag ->
new-session flag -> running sum -> group), which is also the proof the
two formulations agree: Spark starts a new session when the next event's
time is >= previous + gap, exactly the island boundary condition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecollector_spark.driver_queries import register
from ecollector_spark.sources.events_adapter import read_events


@register(
    "session_window_30m",
    shelved=True,  # rotated r5: the streaming replay twin holds the slot
    oracle="""
WITH e AS (
  SELECT user_id, ts, value FROM events WHERE user_id % 31 = 0),
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e),
islands AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM islands GROUP BY user_id, session_no
ORDER BY user_id, session_start
""",
)
def session_window_30m(spark, sf_dir):
    """Sessions with a 30-minute inactivity gap per user: event count and
    value sum per session. Streaming-capable shape (session_window works
    under watermarks with merging state)."""
    ev = read_events(spark, sf_dir).where(F.col("user_id") % 31 == 0)
    g = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
    return g.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_timestamp("w.start").alias("session_start"),
        "n_events",
        "sum_value",
    )


_SESSION_ORACLE = """
WITH e AS (
  SELECT user_id, ts, value FROM events WHERE user_id % 31 = 0),
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e),
islands AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM flagged)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM islands GROUP BY user_id, session_no
ORDER BY user_id, session_start
"""


@register("streaming_session_replay", _SESSION_ORACLE,
    shelved=True,  # rotated out r8 (family keeps a main-gate twin)
)
def streaming_session_replay(spark, sf_dir):
    """§2.8 session windows through the REAL streaming path: file-source
    replay -> watermarked ``session_window`` aggregation (merging state,
    append mode) -> parquet sink, hash-matched against the batch twin's
    gaps-and-islands oracle.

    Append mode only emits a session once the watermark passes its end,
    and an availableNow replay stops at the last data batch — so the
    replay appends one far-future *sentinel* row (user_id -1, beyond
    every real session end + gap + delay) whose only job is to advance
    the global watermark past all real sessions; its own (still-open)
    session is the single row that never emits, and it is filtered out
    of the result. At scale this is exactly how a bounded replay of a
    session pipeline is drained."""
    from ecollector_spark.driver_queries.streaming_q import _stream_through

    ev = read_events(spark, sf_dir).where(F.col("user_id") % 31 == 0)
    # session timezone is pinned to UTC, so NTZ -> TIMESTAMP is a
    # relabel; withWatermark requires the zoned type
    rows = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    sentinel = rows.agg(
        F.lit(-1).cast("long").alias("user_id"),
        (F.max("ts") + F.expr("INTERVAL 4 HOURS")).alias("ts"),
        F.lit(0.0).alias("value"),
    )
    inp = rows.unionByName(sentinel)

    def op(stream):
        g = (
            stream.withWatermark("ts", "30 seconds")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        )
        return g.select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )

    out = _stream_through(spark, inp, op, "session")
    return out.where(F.col("user_id") >= 0).select(
        "user_id", "session_start", "n_events", "sum_value"
    )

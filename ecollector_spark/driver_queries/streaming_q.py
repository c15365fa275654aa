"""Driver queries that exercise the REAL Structured Streaming path: the
events table is replayed through a file-source stream into the stateful
operators (availableNow), and the materialized sink is returned.

The change-suppressed pre-aggregation (A1-A5) has an exact SQL oracle:
per-series directive aggregation over 30 s event-time buckets, keeping a
bucket iff its aggregate differs from the previous bucket's aggregate
(with 0.0 as the pre-history value — new series start suppressed at 0,
agreggator.go:134). Suppress-vs-last-EMITTED equals suppress-vs-previous-
aggregate because equal runs collapse: whenever suppression fires, the
previous aggregate equals the last emitted value by induction.

The counter-difference operator (A6-A10) is registered rows-only: its
seed carry-over makes each bucket's outlier fence depend on the previous
bucket's filtered tail — a sequential recurrence with no tractable SQL
twin (the golden streaming tests pin its values instead).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from ecollector_spark.driver_queries import register
from ecollector_spark.sources.events_adapter import read_events
from ecollector_spark.streaming.pipeline import (
    counter_difference_stateful,
    preaggregate_stateful,
)

#: event_type -> aggregation directive (fixed, so the per-series
#: "last directive wins" rule is deterministic)
_DIRECTIVE = {
    "purchase": "mean",
    "click": "last",
    "view": "max",
    "signup": "min",
    "error": "sum",
}

_DIRECTIVE_SQL = (
    "CASE event_type WHEN 'purchase' THEN 'mean' WHEN 'click' THEN 'last' "
    "WHEN 'view' THEN 'max' WHEN 'signup' THEN 'min' ELSE 'sum' END"
)


def _replay_input(spark, sf_dir):
    """events (sampled) -> stateful-op input rows."""
    ev = read_events(spark, sf_dir).where(F.col("user_id") % 11 == 0)
    directive = F.lit(None).cast("string")
    for et, d in _DIRECTIVE.items():
        directive = F.when(F.col("event_type") == et, d).otherwise(directive)
    return ev.select(
        F.concat(F.col("event_type"), F.lit(";"), (F.col("user_id") % 13).cast("string")).alias(
            "series_id"
        ),
        F.col("ts"),
        F.col("value").alias("value_f"),
        directive.alias("agg_func"),
    )


def _stream_through(spark, rows_df, op, name: str):
    """Write input rows as one JSON file, stream them through ``op`` with
    an availableNow trigger, return the parquet sink as a DataFrame.

    One input file -> one micro-batch -> deterministic event-time output
    (multi-batch replays only shift which invocation emits, not values;
    pinned separately by the restart tests)."""
    tmp = tempfile.mkdtemp(prefix=f"ecollector_{name}_")
    src, sink, ckpt = f"{tmp}/src", f"{tmp}/sink", f"{tmp}/ckpt"
    os.makedirs(src)
    rows = rows_df.collect()
    with open(f"{src}/input.json", "w") as f:
        for r in rows:
            d = r.asDict()
            d["ts"] = d["ts"].isoformat()
            f.write(json.dumps(d) + "\n")
    stream = spark.readStream.schema(rows_df.schema).json(src)
    q = (
        op(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    return spark.read.parquet(sink)


@register(
    "streaming_preagg_replay",
    f"""WITH src AS (
  SELECT event_type || ';' || CAST(user_id % 13 AS VARCHAR) AS series_id,
         ts, value AS value_f, {_DIRECTIVE_SQL} AS agg_func
  FROM events WHERE user_id % 11 = 0),
agg AS (
  SELECT series_id, CAST(floor(epoch(ts)/30) AS BIGINT)*30 + 30 AS time_s,
         min(agg_func) AS agg_func,
         CASE min(agg_func)
           WHEN 'mean' THEN avg(value_f) WHEN 'last' THEN arg_max(value_f, ts)
           WHEN 'max' THEN max(value_f) WHEN 'min' THEN min(value_f)
           ELSE sum(value_f) END AS value
  FROM src GROUP BY 1, CAST(floor(epoch(ts)/30) AS BIGINT)*30 + 30),
sup AS (
  SELECT series_id, time_s, value, agg_func,
         coalesce(lag(value) OVER (PARTITION BY series_id ORDER BY time_s), 0.0) AS prev
  FROM agg)
SELECT series_id, time_s AS time, round(value, 6) AS value, agg_func
FROM sup WHERE value <> prev
ORDER BY series_id, time
""",
)
def streaming_preagg_replay(spark, sf_dir):
    """A1-A5 through the real streaming path: file-source replay ->
    applyInPandasWithState (30 s directive aggregation + change
    suppression) -> parquet sink, oracle-matched bucket for bucket."""
    out = _stream_through(
        spark, _replay_input(spark, sf_dir), preaggregate_stateful, "preagg"
    )
    return out.select(
        "series_id",
        F.unix_timestamp("time").alias("time"),
        F.round("value", 6).alias("value"),
        "agg_func",
    )


@register("streaming_counter_diff_replay")  # rows-only: sequential seed recurrence
def streaming_counter_diff_replay(spark, sf_dir):
    """A6-A10 through the real streaming path (rows-only check; values
    are pinned by the golden streaming tests)."""
    ev = read_events(spark, sf_dir).where(F.col("user_id") % 11 == 0)
    rows = ev.select(
        F.concat(F.lit("meter;"), (F.col("user_id") % 13).cast("string")).alias("series_id"),
        F.col("ts"),
        F.abs(F.col("value")).alias("value_f"),
        (F.col("user_id") % 26 == 0).alias("hourly"),
    )
    out = _stream_through(spark, rows, counter_difference_stateful, "diff")
    return out.select(
        "series_id", F.unix_timestamp("time").alias("time"), F.round("value", 6).alias("value")
    )

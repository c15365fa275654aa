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

The counter-difference operator (A6-A10) is a sequential recurrence —
each bucket's outlier fence depends on the previous bucket's filtered
tail via the carried seed — so its oracle is a DuckDB *recursive CTE*
that steps the per-series state machine bucket by bucket
(``_COUNTER_DIFF_SQL``): the recursion carries the exact state tuple of
``make_counter_difference_fn`` (seed, has_seed, last_emitted, last_ts)
and replays staleness eviction, the Tukey/zero filter, positive-delta
sum, the 100 kWh cap, and change suppression per step with the same
IEEE double operation order, so values hash-match bit for bit. The
ordering contract that makes this deterministic: event timestamps are
unique within a series at the oracle SF, so the stable-by-ts sort in
the pandas state function and ``list(... ORDER BY e)`` agree.
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


def counter_diff_oracle_sql(
    src_sql: str,
    interval: int = 600,
    staleness: int = 7200,
    max_diff: float = 100.0,
    round6: bool = True,
) -> str:
    """Recursive-CTE twin of ``make_counter_difference_fn`` (agreggator.go
    semantics, see streaming/stateful.py), parameterized over a source
    relation ``src(series_id, e, v, hourly)`` (epoch seconds as DOUBLE,
    event order = ascending unique ``e`` per series). Layer map,
    innermost out:

    - join     — step N state + step N+1 bucket (vals/epochs in ts order)
    - ib       — index of the last staleness break (gap > ``staleness``
      between consecutive reports; the incoming last_ts fences event 1)
    - buf      — seed-prefixed values, truncated at the break (A8)
    - q1/q3    — exact linear-interpolation quartiles (n >= 4 only)
    - filtered — hourly: untouched; else drop zeros + Tukey fence=3 (A7)
    - result   — sum of positive consecutive deltas (meter resets skip, A6)
    - do_emit  — ``max_diff`` cap (A10), zero/unchanged suppression
      (hourly series compare only against zero)
    - emit_t   — bucket end; hourly re-attributed to prev hour :59 (A9)

    Every double operation replays the pandas state function's IEEE
    order, so the recursion is bit-identical to the streaming path; the
    property test (tests/test_counter_diff_oracle.py) pins that
    equivalence on random inputs, not just the driver corpus.
    """
    value_sel = "round(emit_value, 6)" if round6 else "emit_value"
    return f"""
WITH RECURSIVE src AS (
{src_sql}
),
bkt AS (
  SELECT series_id,
         CAST(floor(e/{interval}) AS BIGINT)*{interval} AS bucket,
         list(v ORDER BY e) AS vals,
         list(e ORDER BY e) AS epochs,
         arg_max(hourly, e) AS hourly,
         row_number() OVER (PARTITION BY series_id ORDER BY CAST(floor(e/{interval}) AS BIGINT)*{interval}) AS step
  FROM src
  GROUP BY series_id, CAST(floor(e/{interval}) AS BIGINT)*{interval}
),
rec AS (
  SELECT series_id, 0 AS step,
         CAST(0.0 AS DOUBLE) AS seed, false AS has_seed,
         CAST(0.0 AS DOUBLE) AS last_emitted, CAST(-1e18 AS DOUBLE) AS last_ts,
         CAST(NULL AS BIGINT) AS emit_time, CAST(NULL AS DOUBLE) AS emit_value
  FROM (SELECT DISTINCT series_id FROM bkt)
  UNION ALL
  SELECT series_id, step,
         CASE WHEN fn > 0 THEN filtered[-1] ELSE seed0 END AS seed,
         fn > 0 AS has_seed,
         CASE WHEN do_emit THEN result ELSE le0 END AS last_emitted,
         new_last_ts AS last_ts,
         CASE WHEN do_emit THEN emit_t END AS emit_time,
         CASE WHEN do_emit THEN result END AS emit_value
  FROM (
    SELECT *,
           (fn > 0 AND result <= {max_diff} AND result <> 0.0
            AND (hourly OR result <> le0)) AS do_emit,
           CASE WHEN hourly
                THEN CAST(floor((bucket + {interval} - 3600)/3600.0) AS BIGINT)*3600 + 3540
                ELSE bucket + {interval} END AS emit_t
    FROM (
      SELECT *,
             CASE WHEN fn <= 1 THEN 0.0
                  ELSE list_reduce(
                         list_transform(generate_series(2, fn),
                           i -> CASE WHEN filtered[i] >= filtered[i-1]
                                     THEN filtered[i] - filtered[i-1] ELSE 0.0 END),
                         (a, b) -> a + b)
             END AS result
      FROM (
        SELECT *, len(filtered) AS fn
        FROM (
          SELECT *,
                 CASE WHEN hourly THEN buf
                      WHEN n >= 4 THEN list_filter(buf, x -> x <> 0.0 AND x >= q1 - 3.0*(q3 - q1) AND x <= q3 + 3.0*(q3 - q1))
                      ELSE list_filter(buf, x -> x <> 0.0)
                 END AS filtered
          FROM (
            SELECT *,
                   CASE WHEN n >= 4 THEN s[CAST(floor((n-1)*0.25) AS INT) + 1]
                        + (s[least(CAST(floor((n-1)*0.25) AS INT) + 2, n)]
                           - s[CAST(floor((n-1)*0.25) AS INT) + 1])
                          * ((n-1)*0.25 - floor((n-1)*0.25)) END AS q1,
                   CASE WHEN n >= 4 THEN s[CAST(floor((n-1)*0.75) AS INT) + 1]
                        + (s[least(CAST(floor((n-1)*0.75) AS INT) + 2, n)]
                           - s[CAST(floor((n-1)*0.75) AS INT) + 1])
                          * ((n-1)*0.75 - floor((n-1)*0.75)) END AS q3
            FROM (
              SELECT *, len(buf) AS n, list_sort(buf) AS s
              FROM (
                SELECT *,
                       CASE WHEN ib = 0
                            THEN (CASE WHEN hs0 THEN [seed0] ELSE CAST([] AS DOUBLE[]) END) || vals
                            ELSE vals[ib:] END AS buf
                FROM (
                  SELECT *,
                         coalesce(list_max(list_filter(
                           list_transform(generate_series(1, len(epochs)),
                             i -> CASE WHEN epochs[i] - (CASE WHEN i = 1 THEN lt0 ELSE epochs[i-1] END) > {staleness}.0
                                  THEN i END),
                           x -> x IS NOT NULL)), 0) AS ib,
                         epochs[-1] AS new_last_ts
                  FROM (
                    SELECT b.series_id, b.step, b.bucket, b.vals, b.epochs, b.hourly,
                           r.seed AS seed0, r.has_seed AS hs0,
                           r.last_emitted AS le0, r.last_ts AS lt0
                    FROM rec r JOIN bkt b ON b.series_id = r.series_id AND b.step = r.step + 1
                  )
                )
              )
            )
          )
        )
      )
    )
  )
)
SELECT series_id, emit_time AS time, {value_sel} AS value
FROM rec WHERE emit_value IS NOT NULL
ORDER BY series_id, time
"""


_COUNTER_DIFF_SQL = counter_diff_oracle_sql(
    """  SELECT 'meter;' || CAST(user_id % 13 AS VARCHAR) AS series_id,
         epoch(ts) AS e, abs(value) AS v, (user_id % 26 = 0) AS hourly
  FROM events
  WHERE user_id % 11 = 0 AND value IS NOT NULL"""
)


@register("streaming_counter_diff_replay", _COUNTER_DIFF_SQL)
def streaming_counter_diff_replay(spark, sf_dir):
    """A6-A10 through the real streaming path: file-source replay ->
    applyInPandasWithState (counter difference with staleness eviction,
    Tukey/zero filter, reset skip, 100 kWh cap, hour re-attribution) ->
    parquet sink — value-matched against the recursive-CTE oracle."""
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

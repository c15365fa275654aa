"""Core time-series queries: the reference's structured query API (Q2),
energy rollup (A17), pre-aggregation (A1-A11), filters (F1-F5), topic
matching (S2), regroup (A18/J2) and enrichment (J1) — each exercised on
the driver's ``events`` table via the canonical datapoints adapter and
oracle-checked against DuckDB.

Determinism: every aggregate over doubles is rounded (means/sums to 3
decimals, deltas/medians to 6) on BOTH sides; bucket arithmetic is
floor(epoch/step)*step on both sides; time is always epoch seconds BIGINT
(the reference's wire precision, influxdb_v1.go:191).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from ecollector_spark.aggregate import counter_difference, tukey_outliers, windowed_preaggregate
from ecollector_spark.driver_queries import register
from ecollector_spark.session import read_parquet
from ecollector_spark.filters import FilterRecord, compile_filters
from ecollector_spark.fimp import route_to_regex, route_includes_topic
from ecollector_spark.query import DataPointsFilter, DataPointsRequest, QueryPlanner
from ecollector_spark.sources.events_adapter import EVENTS_DP_SQL, events_as_datapoints

NOW = datetime(2024, 2, 1, tzinfo=timezone.utc)
FROM_T = "2024-01-01T00:00:00Z"
TO_T = "2024-02-01T00:00:00Z"
F_EPOCH = 1704067200
T_EPOCH = 1706745600

_DP = f"WITH dp AS ({EVENTS_DP_SQL})"


def _planner(spark, sf_dir) -> QueryPlanner:
    dp = events_as_datapoints(spark, sf_dir)
    return QueryPlanner(lambda tier: dp)


def _plan(spark, sf_dir, **kw):
    req = DataPointsRequest(**kw)
    return _planner(spark, sf_dir).plan(req, now=NOW)


def _src_sql(measurement: str, extra: str = "") -> str:
    return (
        f"SELECT * FROM dp WHERE measurement = '{measurement}' "
        f"AND epoch(ts) >= {F_EPOCH} AND epoch(ts) <= {T_EPOCH}{extra}"
    )


def _bucket(step: int) -> str:
    return f"CAST(floor(epoch(ts)/{step}) AS BIGINT)*{step}"


def _spine(step: int) -> str:
    return (
        f"SELECT CAST(g.generate_series AS BIGINT) AS time "
        f"FROM generate_series({F_EPOCH}, {T_EPOCH}, {step}) g"
    )


# ---------------------------------------------------------------------------
# Q2 planner shapes (A12-A16, F4/F5)
# ---------------------------------------------------------------------------

@register(
    "ts_group_by_time_mean",
    f"""{_DP},
src AS ({_src_sql('purchase')}),
agg AS (SELECT {_bucket(3600)} AS time, round(avg(value_f), 3) AS value FROM src GROUP BY 1),
spine AS ({_spine(3600)})
SELECT spine.time AS time, agg.value AS value FROM spine LEFT JOIN agg USING (time) ORDER BY time
""",
)
def ts_group_by_time_mean(spark, sf_dir):
    """SURVEY A12+A14+A16: GROUP BY time(1h) mean, FILL(null)."""
    df = _plan(
        spark,
        sf_dir,
        measurement_name="purchase",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_time="1h",
        data_function="mean",
        fill_type="null",
    )
    return df.withColumn("value", F.round("value", 3))


@register(
    "ts_group_by_time_tag_fill_previous",
    f"""{_DP},
src AS ({_src_sql('click')}),
agg AS (SELECT {_bucket(21600)} AS time, location_id, round(avg(value_f), 3) AS value
        FROM src GROUP BY 1, 2),
spine AS (SELECT s.time, g.location_id
          FROM ({_spine(21600)}) s CROSS JOIN (SELECT DISTINCT location_id FROM agg) g),
joined AS (SELECT spine.time, spine.location_id, agg.value
           FROM spine LEFT JOIN agg ON spine.time = agg.time AND spine.location_id = agg.location_id)
SELECT time, location_id,
       last_value(value IGNORE NULLS) OVER (PARTITION BY location_id ORDER BY time
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
FROM joined ORDER BY time, location_id
""",
)
def ts_group_by_time_tag_fill_previous(spark, sf_dir):
    """SURVEY A12+A13+A16: GROUP BY time(6h), location_id FILL(previous)."""
    dp = events_as_datapoints(spark, sf_dir)
    # round before fill so propagated values match the oracle's rounded agg
    planner = QueryPlanner(lambda tier: dp)
    req = DataPointsRequest(
        measurement_name="click",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_time="6h",
        group_by_tag="location_id",
        data_function="mean",
        fill_type="previous",
    )
    # plan with fill=null then round + fill previous manually to keep
    # rounding order identical to the oracle
    from ecollector_spark.gapfill import gap_fill

    req_null = DataPointsRequest(**{**req.__dict__, "fill_type": "none"})
    agg = planner.plan(req_null, now=NOW).withColumn("value", F.round("value", 3))
    return gap_fill(agg, "previous", F_EPOCH, T_EPOCH, 21600, ["location_id"]).select(
        F.col("time").cast("long"), "location_id", F.col("value").cast("double")
    )


@register(
    "ts_group_by_tag_raw",
    f"""{_DP},
src AS ({_src_sql('error')})
SELECT CAST(floor(epoch(ts)) AS BIGINT) AS time, dev_id, value_f AS value
FROM src WHERE location_id IN ('1','2') ORDER BY time, dev_id
""",
    shelved=True,
)
def ts_group_by_tag_raw(spark, sf_dir):
    """SURVEY A13/F4: raw field grouped by tag with location filter."""
    return _plan(
        spark,
        sf_dir,
        measurement_name="error",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_tag="dev_id",
        filters=DataPointsFilter(locations=["1", "2"]),
    )


@register(
    "ts_agg_count_fill_zero",
    f"""{_DP},
src AS ({_src_sql('view')}),
agg AS (SELECT {_bucket(86400)} AS time, round(CAST(count(value_f) AS DOUBLE), 3) AS value
        FROM src GROUP BY 1),
spine AS ({_spine(86400)})
SELECT spine.time AS time, coalesce(agg.value, 0.0) AS value
FROM spine LEFT JOIN agg USING (time) ORDER BY time
""",
)
def ts_agg_count_fill_zero(spark, sf_dir):
    """SURVEY A19: COUNT per 1d bucket, FILL(0)."""
    df = _plan(
        spark,
        sf_dir,
        measurement_name="view",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_time="1d",
        data_function="count",
        fill_type="0",
    )
    return df.withColumn("value", F.round("value", 3))


@register(
    "ts_agg_last",
    f"""{_DP},
src AS ({_src_sql('signup')}),
agg AS (SELECT {_bucket(43200)} AS time, max_by(value_f, ts) AS value FROM src GROUP BY 1),
spine AS ({_spine(43200)})
SELECT spine.time AS time, agg.value AS value FROM spine LEFT JOIN agg USING (time) ORDER BY time
""",
    shelved=True,
)
def ts_agg_last(spark, sf_dir):
    """SURVEY A4/A14: last() per 12h bucket (most recent point wins)."""
    return _plan(
        spark,
        sf_dir,
        measurement_name="signup",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_time="12h",
        data_function="last",
        fill_type="null",
    )


@register(
    "ts_agg_sum_fill_zero",
    f"""{_DP},
src AS ({_src_sql('purchase')}),
agg AS (SELECT {_bucket(86400)} AS time, round(sum(value_f), 3) AS value FROM src GROUP BY 1),
spine AS ({_spine(86400)})
SELECT spine.time AS time, coalesce(agg.value, 0.0) AS value
FROM spine LEFT JOIN agg USING (time) ORDER BY time
""",
    shelved=True,
)
def ts_agg_sum_fill_zero(spark, sf_dir):
    """SURVEY A3/A14: SUM per 1d bucket, FILL(0)."""
    df = _plan(
        spark,
        sf_dir,
        measurement_name="purchase",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_time="1d",
        data_function="sum",
        fill_type="0",
    )
    # round, then re-apply zero fill semantics (round(null)=null)
    return df.withColumn("value", F.coalesce(F.round("value", 3), F.lit(0.0)))


@register(
    "ts_agg_median",
    f"""{_DP},
src AS ({_src_sql('error')}),
agg AS (SELECT {_bucket(86400)} AS time, round(quantile_cont(value_f, 0.5), 6) AS value
        FROM src GROUP BY 1),
spine AS ({_spine(86400)})
SELECT spine.time AS time, agg.value AS value FROM spine LEFT JOIN agg USING (time) ORDER BY time
""",
    shelved=True,
)
def ts_agg_median(spark, sf_dir):
    """SURVEY A14: median per 1d bucket (exact interpolated percentile)."""
    df = _plan(
        spark,
        sf_dir,
        measurement_name="error",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_time="1d",
        data_function="median",
        fill_type="null",
    )
    return df.withColumn("value", F.round("value", 6))


@register(
    "ts_agg_min",
    f"""{_DP},
src AS ({_src_sql('click')}),
agg AS (SELECT {_bucket(86400)} AS time, min(value_f) AS value FROM src GROUP BY 1),
spine AS ({_spine(86400)})
SELECT spine.time AS time, agg.value AS value FROM spine LEFT JOIN agg USING (time) ORDER BY time
""",
    shelved=True,  # rotated out r6 (family keeps a main-gate twin)
)
def ts_agg_min(spark, sf_dir):
    """SURVEY A2/A14: MIN per 1d bucket."""
    return _plan(
        spark,
        sf_dir,
        measurement_name="click",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_time="1d",
        data_function="min",
        fill_type="null",
    )


@register(
    "ts_agg_first",
    f"""{_DP},
src AS ({_src_sql('signup')}),
agg AS (SELECT {_bucket(43200)} AS time, min_by(value_f, ts) AS value FROM src GROUP BY 1),
spine AS ({_spine(43200)})
SELECT spine.time AS time, agg.value AS value FROM spine LEFT JOIN agg USING (time) ORDER BY time
""",
    shelved=True,  # rotated out r6 (family keeps a main-gate twin)
)
def ts_agg_first(spark, sf_dir):
    """SURVEY A14: first() per 12h bucket (earliest point wins) — the
    selector twin of ts_agg_last (min_by on both engines)."""
    return _plan(
        spark,
        sf_dir,
        measurement_name="signup",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_time="12h",
        data_function="first",
        fill_type="null",
    )


@register(
    "ts_agg_max",
    f"""{_DP},
src AS ({_src_sql('click')}),
agg AS (SELECT {_bucket(86400)} AS time, max(value_f) AS value FROM src GROUP BY 1),
spine AS ({_spine(86400)})
SELECT spine.time AS time, agg.value AS value FROM spine LEFT JOIN agg USING (time) ORDER BY time
""",
    shelved=True,
)
def ts_agg_max(spark, sf_dir):
    """SURVEY A2/A14: MAX per 1d bucket."""
    return _plan(
        spark,
        sf_dir,
        measurement_name="click",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_time="1d",
        data_function="max",
        fill_type="null",
    )


@register(
    "ts_overall_mean_by_tag",
    f"""{_DP},
src AS ({_src_sql('purchase')})
SELECT CAST({F_EPOCH} AS BIGINT) AS time, location_id, round(avg(value_f), 3) AS value
FROM src GROUP BY 2 ORDER BY location_id
""",
    shelved=True,
)
def ts_overall_mean_by_tag(spark, sf_dir):
    """SURVEY A13/A14: whole-range mean per tag (row stamped range start)."""
    df = _plan(
        spark,
        sf_dir,
        measurement_name="purchase",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_tag="location_id",
        data_function="mean",
    )
    return df.withColumn("value", F.round("value", 3))


@register(
    "ts_filtered_devices_raw",
    f"""{_DP},
src AS ({_src_sql('purchase')})
SELECT CAST(floor(epoch(ts)) AS BIGINT) AS time, value_f AS value
FROM src WHERE dev_id IN ('1','2','3') AND dir = 'import' ORDER BY time
""",
)
def ts_filtered_devices_raw(spark, sf_dir):
    """SURVEY F4/F5: raw select with device-list + tag-equality filters."""
    return _plan(
        spark,
        sf_dir,
        measurement_name="purchase",
        from_time=FROM_T,
        to_time=TO_T,
        filters=DataPointsFilter(tags={"dir": "import"}, devices=["1", "2", "3"]),
    )


@register(
    "ts_transform_difference_max",
    f"""{_DP},
src AS ({_src_sql('purchase')}),
agg AS (SELECT {_bucket(86400)} AS time, dev_id, max(value_f) AS value FROM src GROUP BY 1, 2)
SELECT time, dev_id, round(value - lag(value) OVER (PARTITION BY dev_id ORDER BY time), 6) AS value
FROM agg QUALIFY lag(value) OVER (PARTITION BY dev_id ORDER BY time) IS NOT NULL
ORDER BY time, dev_id
""",
    shelved=True,
)
def ts_transform_difference_max(spark, sf_dir):
    """SURVEY A15: transform wrap difference(max(value)) per dev_id —
    the reference's energy-dashboard pattern (influxdb_v1.go:229-231)."""
    df = _plan(
        spark,
        sf_dir,
        measurement_name="purchase",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_time="1d",
        group_by_tag="dev_id",
        data_function="max",
        transform_function="difference",
    )
    return df.withColumn("value", F.round("value", 6))


@register(
    "energy_rollup",
    f"""{_DP},
src AS ({_src_sql('purchase')}),
agg AS (SELECT {_bucket(3600)} AS time, location_id, round(sum(value_f), 3) AS value
        FROM src GROUP BY 1, 2),
spine AS (SELECT s.time, g.location_id
          FROM ({_spine(3600)}) s CROSS JOIN (SELECT DISTINCT location_id FROM agg) g)
SELECT spine.time AS time, spine.location_id AS location_id, agg.value AS value
FROM spine LEFT JOIN agg ON spine.time = agg.time AND spine.location_id = agg.location_id
ORDER BY 1, 2
""",
)
def energy_rollup(spark, sf_dir):
    """SURVEY A17: GetEnergyDataPoints — windowed SUM grouped by time+tag
    FILL(null); group_by_time regex-validated (influxdb_v1.go:36,233-234:
    invalid -> '1h')."""
    import re

    group_by_time = "61x"  # invalid on purpose -> falls back to 1h
    if not re.match(r"^\d{1,2}[mhdw]$", group_by_time):
        group_by_time = "1h"
    df = _plan(
        spark,
        sf_dir,
        measurement_name="purchase",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_time=group_by_time,
        group_by_tag="location_id",
        data_function="sum",
        fill_type="null",
    )
    return df.withColumn("value", F.round("value", 3))


# ---------------------------------------------------------------------------
# Streaming pre-aggregation, batch-checked (A1-A4, A6, A7, A11, T11)
# ---------------------------------------------------------------------------

_AGG_CASE = (
    "CASE WHEN user_id % 4 = 0 THEN 'mean' WHEN user_id % 4 = 1 THEN 'last' "
    "WHEN user_id % 4 = 2 THEN 'max' ELSE 'sum' END"
)


@register(
    "preagg_30s_directives",
    f"""{_DP},
src AS (SELECT *, {_AGG_CASE.replace('user_id', "CAST(dev_id AS BIGINT)")} AS af FROM dp),
agg AS (
  SELECT series_id, af, {_bucket(30)} AS time,
         avg(value_f) AS _mean, min(value_f) AS _min, max(value_f) AS _max,
         sum(value_f) AS _sum, max_by(value_f, ts) AS _last
  FROM src GROUP BY 1, 2, 3)
SELECT series_id, time,
       round(CASE af WHEN 'mean' THEN _mean WHEN 'min' THEN _min WHEN 'max' THEN _max
                     WHEN 'sum' THEN _sum WHEN 'last' THEN _last END, 3) AS value
FROM agg ORDER BY series_id, time
""",
)
def preagg_30s_directives(spark, sf_dir):
    """SURVEY A1-A4/A11/T11: 30 s tumbling pre-aggregation where each
    series carries its own aggregation directive (agreggator.go:158-214)."""
    dp = events_as_datapoints(spark, sf_dir).withColumn(
        "agg_func", F.expr(_AGG_CASE.replace("user_id", "CAST(dev_id AS BIGINT)"))
    )
    out = windowed_preaggregate(dp, 30)
    return out.select("series_id", "time", F.round("value", 3).alias("value"))


@register(
    "counter_difference_10m",
    f"""{_DP},
src AS (SELECT * FROM dp WHERE measurement = 'purchase'),
deltas AS (
  SELECT series_id, {_bucket(600)} AS time,
         value_f - lag(value_f) OVER (PARTITION BY series_id ORDER BY ts) AS d
  FROM src),
agg AS (
  SELECT series_id, time, round(sum(CASE WHEN d >= 0 THEN d ELSE 0 END), 6) AS value
  FROM deltas WHERE d IS NOT NULL GROUP BY 1, 2)
SELECT series_id, time, value FROM agg WHERE value > 0 AND value <= 100
ORDER BY series_id, time
""",
)
def counter_difference_10m(spark, sf_dir):
    """SURVEY A6/A10: monotonic-counter positive-delta sum per 10-min
    sample with meter-reset skip and the 100-unit plausibility cap."""
    dp = events_as_datapoints(spark, sf_dir).where(F.col("measurement") == "purchase")
    out = counter_difference(dp, 600)
    return out.select("series_id", "time", F.round("value", 6).alias("value")).where(
        (F.col("value") > 0) & (F.col("value") <= 100)
    )


@register(
    "outlier_fence",
    f"""{_DP},
src AS (SELECT * FROM dp WHERE measurement = 'purchase'),
q AS (SELECT series_id, quantile_cont(value_f, 0.25) AS q1, quantile_cont(value_f, 0.75) AS q3
      FROM src GROUP BY 1)
SELECT s.series_id, CAST(floor(epoch(s.ts)) AS BIGINT) AS time, s.value_f AS value
FROM src s JOIN q USING (series_id)
WHERE s.value_f = 0 OR s.value_f < q.q1 - 3*(q.q3 - q.q1) OR s.value_f > q.q3 + 3*(q.q3 - q.q1)
ORDER BY series_id, time
""",
)
def outlier_fence(spark, sf_dir):
    """SURVEY A7: Tukey extreme-outlier fence per series (zeros are noise
    too, agreggator.go:327-340)."""
    dp = events_as_datapoints(spark, sf_dir).where(F.col("measurement") == "purchase")
    out = tukey_outliers(dp, ("series_id",))
    return (
        out.where(F.col("is_outlier"))
        .select("series_id", F.unix_timestamp("ts").alias("time"), F.col("value_f").alias("value"))
        
    )


# ---------------------------------------------------------------------------
# Filter engine, topic matching (F1/F2, S2)
# ---------------------------------------------------------------------------

@register(
    "filter_engine_chain",
    f"""{_DP},
src AS (SELECT *, 'evt.' || measurement || '.report' AS msg_type FROM dp)
SELECT CAST(floor(epoch(ts)) AS BIGINT) AS time, topic, value_f AS value
FROM src
WHERE service <> 'ecollector'
  AND (service = 'purchase' OR (service = 'click' AND NOT (domain = 'site1')))
ORDER BY time, topic
""",
)
def filter_engine_chain(spark, sf_dir):
    """SURVEY F1/F2: linked filter chain (or + and + negation) compiled to
    one Column; first atomic filter decides (process.go:234-287)."""
    dp = events_as_datapoints(spark, sf_dir).withColumn(
        "msg_type", F.concat(F.lit("evt."), F.col("measurement"), F.lit(".report"))
    )
    records = [
        FilterRecord(id=1, service="purchase", is_atomic=True, linked_filter_id=2,
                     linked_filter_boolean_operation="or"),
        FilterRecord(id=2, service="click", is_atomic=False, linked_filter_id=3,
                     linked_filter_boolean_operation="and"),
        FilterRecord(id=3, domain="site1", negation=True, is_atomic=False),
    ]
    keep = compile_filters(records)
    return (
        dp.where(keep)
        .select(F.unix_timestamp("ts").alias("time"), "topic", F.col("value_f").alias("value"))
        
    )


_ROUTE = "pt:j1/+/rt:dev/rn:test/ad:1/sv:purchase/#"
_ROUTE_REGEX = route_to_regex(_ROUTE)


@register(
    "topic_wildcard_match",
    f"""{_DP}
SELECT topic, count(*) AS n FROM dp
WHERE regexp_matches(topic, '{_ROUTE_REGEX}')
GROUP BY topic ORDER BY topic
""",
    shelved=True,  # rotated out r9 (family keeps a main-gate twin)
)
def topic_wildcard_match(spark, sf_dir):
    """SURVEY S2: MQTT +/# wildcard route compiled to an anchored regex
    (utils.go:13-41 semantics)."""
    dp = events_as_datapoints(spark, sf_dir)
    return (
        dp.where(route_includes_topic(_ROUTE, "topic"))
        .groupBy("topic")
        .agg(F.count("*").alias("n"))
        
    )


# ---------------------------------------------------------------------------
# Regroup + enrichment joins (A18, J1, J2)
# ---------------------------------------------------------------------------

@register(
    "two_level_group_energy",
    f"""{_DP},
src AS ({_src_sql('purchase')}),
per_dev AS (SELECT {_bucket(3600)} AS time, dev_id, sum(value_f) AS v FROM src GROUP BY 1, 2),
groups AS (SELECT DISTINCT dev_id, location_id AS group_id FROM dp)
SELECT p.time, g.group_id, round(sum(p.v), 3) AS value
FROM per_dev p JOIN groups g USING (dev_id)
GROUP BY 1, 2 ORDER BY time, group_id
""",
)
def two_level_group_energy(spark, sf_dir):
    """SURVEY A18/J2: hourly per-device sums regrouped by device-group
    (location) and re-summed — the two-level group InfluxQL couldn't do
    (influxdb_v1.go:205-211; dead impl data_frames.go:372-439)."""
    from ecollector_spark.functions.timeutil import time_bucket

    dp = events_as_datapoints(spark, sf_dir).where(
        (F.col("measurement") == "purchase")
        & (F.unix_timestamp("ts") >= F_EPOCH)
        & (F.unix_timestamp("ts") <= T_EPOCH)
    )
    per_dev = dp.groupBy(time_bucket("ts", 3600).alias("time"), "dev_id").agg(
        F.sum("value_f").alias("v")
    )
    groups = dp.select("dev_id", F.col("location_id").alias("group_id")).distinct()
    return (
        per_dev.join(F.broadcast(groups), "dev_id")
        .groupBy("time", "group_id")
        .agg(F.round(F.sum("v"), 3).alias("value"))
        
    )


@register(
    "enrichment_left_join",
    f"""{_DP}
SELECT CAST(floor(epoch(dp.ts)) AS BIGINT) AS time, dp.dev_id, n.n_name, dp.value_f AS value
FROM dp LEFT JOIN nation n ON CAST(dp.dev_id AS BIGINT) % 30 = n.n_nationkey
WHERE dp.measurement = 'signup'
ORDER BY time, dev_id
""",
)
def enrichment_left_join(spark, sf_dir):
    """SURVEY J1/T3: stream-dimension broadcast LEFT join; missing
    metadata tolerated (process.go:141-145) -> null columns survive."""
    dp = events_as_datapoints(spark, sf_dir).where(F.col("measurement") == "signup")
    nation = read_parquet(spark, f"{sf_dir}/nation.parquet")
    dim = F.broadcast(
        nation.select((F.col("n_nationkey")).alias("_k"), "n_name")
    )
    return (
        dp.withColumn("_k", (F.col("dev_id").cast("long") % 30).cast("int"))
        .join(dim, "_k", "left")
        .select(F.unix_timestamp("ts").alias("time"), "dev_id", "n_name",
                F.col("value_f").alias("value"))
        
    )


@register(
    "raw_sql_query",
    f"""SELECT event_type,
       CAST(floor(epoch(ts)/1800) AS BIGINT)*1800 AS time,
       count(*) AS n
FROM events WHERE event_type = 'error'
GROUP BY 1, 2 ORDER BY time
""",
)
def raw_sql_query(spark, sf_dir):
    """SURVEY Q1/§2.10 cmd.tsdb.query: raw query endpoint — Spark SQL is
    the engine's query language (the reference forwarded raw InfluxQL,
    admin.go:156-177). The presence-count query from docs/api:9."""
    from ecollector_spark.sources.events_adapter import read_events

    read_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(floor(unix_timestamp(ts)/1800) AS BIGINT)*1800 AS time,
               count(*) AS n
        FROM events WHERE event_type = 'error'
        GROUP BY 1, 2 ORDER BY time
        """
    )


@register(
    "events_top3_users_per_type",
    """WITH c AS (
  SELECT event_type, user_id, count(*) AS n_events
  FROM events GROUP BY 1, 2)
SELECT event_type, user_id, n_events, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY n_events DESC, user_id) AS rnk
  FROM c)
WHERE rnk <= 3 ORDER BY event_type, rnk
""",
    shelved=True,
)
def events_top3_users_per_type(spark, sf_dir):
    """Grouped top-n (top 3 users by event count per type): pre-aggregate
    shrinks the fact table to (type, user) counts map-side before the
    single rank shuffle — the scalable shape of per-group leaderboards."""
    from pyspark.sql import Window

    from ecollector_spark.sources.events_adapter import read_events

    ev = read_events(spark, sf_dir)
    counts = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n_events"), "user_id")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("event_type", "user_id", "n_events", F.col("rnk").cast("int").alias("rnk"))
        
    )


@register(
    "scale_salted_aggregate",
    """SELECT event_type,
       count(value) AS n, max(value) AS max_v, min(value) AS min_v,
       sum(user_id) AS sum_uid
FROM events GROUP BY 1 ORDER BY 1
""",
    shelved=True,  # scale-helper variant of the plain groupBy (same values)
)
def scale_salted_aggregate(spark, sf_dir):
    """Two-stage salted aggregation (functions/skew.py) value-matched
    against the plain one-stage groupBy: count/min/max and an exact
    integer sum are associative+commutative, so the salt fan-out changes
    the physical plan (hot keys spread over salt_buckets reducers), not
    the result — which is exactly the property that makes salting safe
    to deploy against a skewed key at 100 TB."""
    from ecollector_spark.functions.skew import salted_aggregate
    from ecollector_spark.sources.events_adapter import read_events

    ev = read_events(spark, sf_dir)
    out = salted_aggregate(
        ev,
        ["event_type"],
        {
            "n": ("count", "value"),
            "max_v": ("max", "value"),
            "min_v": ("min", "value"),
            "sum_uid": ("sum", "user_id"),
        },
        salt_buckets=8,
    )
    return out.orderBy("event_type")

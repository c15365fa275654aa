"""Planner shapes completing the A15/A16 oracle coverage: the abs
transform wrap and FILL(linear)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecollector_spark.driver_queries import register
from ecollector_spark.driver_queries.core import (
    F_EPOCH,
    FROM_T,
    NOW,
    T_EPOCH,
    TO_T,
    _bucket,
    _DP,
    _plan,
    _spine,
    _src_sql,
)


@register(
    "ts_transform_abs_diff",
    f"""{_DP},
src AS ({_src_sql('purchase')}),
agg AS (SELECT {_bucket(21600)} AS time, arg_max(value_f, ts) AS value FROM src GROUP BY 1),
d AS (SELECT time, value - lag(value) OVER (ORDER BY time) AS value FROM agg)
SELECT time, round(abs(value), 6) AS value FROM d WHERE value IS NOT NULL ORDER BY time
""",
    shelved=True,
)
def ts_transform_abs_diff(spark, sf_dir):
    """A15 transform wrap f(g(x)): abs(difference(last(value))) per 6h
    bucket — the InfluxQL ``abs(difference(...))`` shape
    (influxdb_v1.go:184-186, 229-231)."""
    df = _plan(
        spark,
        sf_dir,
        measurement_name="purchase",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_time="6h",
        data_function="difference",
        transform_function="abs",
    )
    return df.withColumn("value", F.round("value", 6))


@register(
    "ts_agg_mean_fill_linear",
    f"""{_DP},
src AS ({_src_sql('signup')}),
agg AS (SELECT {_bucket(14400)} AS time, round(avg(value_f), 3) AS value FROM src GROUP BY 1),
spine AS ({_spine(14400)}),
joined AS (SELECT spine.time, agg.value FROM spine LEFT JOIN agg USING (time)),
w AS (SELECT time, value,
  last_value(value IGNORE NULLS) OVER (ORDER BY time
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
  first_value(value IGNORE NULLS) OVER (ORDER BY time
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
  last_value(CASE WHEN value IS NOT NULL THEN time END IGNORE NULLS) OVER (ORDER BY time
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
  first_value(CASE WHEN value IS NOT NULL THEN time END IGNORE NULLS) OVER (ORDER BY time
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM joined)
SELECT time,
  round(CASE WHEN value IS NOT NULL THEN value
             WHEN pt = nt THEN pv
             ELSE pv + (nv - pv) * (time - pt) / (nt - pt) END, 6) AS value
FROM w ORDER BY time
""",
    shelved=True,
)
def ts_agg_mean_fill_linear(spark, sf_dir):
    """A16 FILL(linear): empty buckets interpolated between neighbors;
    leading/trailing gaps stay null (InfluxDB linear-fill semantics)."""
    from ecollector_spark.gapfill import gap_fill
    from ecollector_spark.query import DataPointsRequest
    from ecollector_spark.driver_queries.core import _planner

    # round the aggregate before filling so interpolation runs over the
    # same numbers as the oracle, then round the interpolant
    req = DataPointsRequest(
        measurement_name="signup",
        from_time=FROM_T,
        to_time=TO_T,
        group_by_time="4h",
        data_function="mean",
        fill_type="none",
    )
    agg = _planner(spark, sf_dir).plan(req, now=NOW).withColumn("value", F.round("value", 3))
    filled = gap_fill(agg, "linear", F_EPOCH, T_EPOCH, 14400, [])
    return filled.select(
        F.col("time").cast("long").alias("time"), F.round("value", 6).alias("value")
    )


@register(
    "influxql_desc_limit",
    f"""{_DP},
src AS ({_src_sql('purchase')}),
agg AS (SELECT {_bucket(86400)} AS time, location_id, round(avg(value_f), 3) AS value
        FROM src GROUP BY 1, 2),
r AS (SELECT time, location_id, value,
             row_number() OVER (PARTITION BY location_id ORDER BY time DESC) AS rn
      FROM agg)
SELECT time, location_id, value FROM r WHERE rn > 1 AND rn <= 4
ORDER BY location_id, time DESC
""",
    shelved=True,
)
def influxql_desc_limit(spark, sf_dir):
    """The round-5 hand-written InfluxQL surface on the value signal:
    ``ORDER BY time DESC LIMIT 3 OFFSET 1`` (per-series bounds under a
    tag group, InfluxDB public-docs semantics) parsed from a raw query
    string and applied by influxql.apply_result_shape on top of the
    structured planner. [influxdb_v1.go:97-200 is the generated-string
    surface; this covers the ad-hoc drop-in queries beyond it]"""
    from ecollector_spark.influxql import apply_result_shape, parse_influxql
    from ecollector_spark.driver_queries.core import _planner

    q = (
        'SELECT mean("value") FROM "purchase" '
        f"WHERE time >= '{FROM_T}' AND time <= '{TO_T}' "
        "GROUP BY time(1d), location_id FILL(none) "
        "ORDER BY time DESC LIMIT 3 OFFSET 1"
    )
    iq = parse_influxql(q)
    df = _planner(spark, sf_dir).plan(iq.request, now=NOW)
    df = df.withColumn("value", F.round("value", 3))
    df = apply_result_shape(df, iq)
    return df.select(
        F.col("time").cast("long").alias("time"),
        "location_id",
        F.col("value").cast("double").alias("value"),
    )


@register(
    "influxql_tag_regex",
    f"""{_DP},
src AS ({_src_sql('click')}),
f AS (SELECT * FROM src
      WHERE regexp_matches(location_id, '^[12]$') AND dev_id <> '3'),
agg AS (SELECT {_bucket(86400)} AS time, location_id,
               round(avg(value_f), 3) AS value
        FROM f GROUP BY 1, 2)
SELECT time, location_id, value FROM agg ORDER BY time, location_id
""",
    shelved=True,
)
def influxql_tag_regex(spark, sf_dir):
    """The r5 hand-written WHERE surface on the value signal: negated
    (``!=``) and regex (``=~ /re/``) tag predicates parsed from a raw
    InfluxQL string and pushed through the structured planner as
    ``<>`` / ``rlike`` filters. [public InfluxDB docs surface — beyond
    the equality-only strings the reference generates,
    influxdb_v1.go:145-156]"""
    from ecollector_spark.influxql import parse_influxql

    q = (
        'SELECT mean("value") FROM "click" '
        f"WHERE time >= '{FROM_T}' AND time <= '{TO_T}' "
        "AND \"location_id\"=~/^[12]$/ AND \"dev_id\"!='3' "
        "GROUP BY time(1d), location_id FILL(none)"
    )
    iq = parse_influxql(q)
    from ecollector_spark.driver_queries.core import _planner

    df = _planner(spark, sf_dir).plan(iq.request, now=NOW)
    return df.select(
        F.col("time").cast("long").alias("time"),
        "location_id",
        F.round("value", 3).alias("value"),
    )


@register(
    "influxql_two_tag_group",
    f"""{_DP},
src AS ({_src_sql('view')}),
agg AS (SELECT {_bucket(86400)} AS time, location_id, dev_id,
               arg_max(value_f, ts) AS value
        FROM src GROUP BY 1, 2, 3)
SELECT time, location_id, dev_id, value FROM agg
ORDER BY time, location_id, dev_id
""",
    shelved=True,
)
def influxql_two_tag_group(spark, sf_dir):
    """Multi-tag GROUP BY on the value signal: ``GROUP BY time(1d),
    location_id, dev_id`` parsed from a raw InfluxQL string — the
    comma-joined tag list rides the single ``group_by_tag`` field
    (reference-struct parity, types.go:8-21) and fans out through
    split_group_tags in the planner, serializer, and result-shape
    clauses. last() keeps the query on the raw tier."""
    from ecollector_spark.influxql import parse_influxql
    from ecollector_spark.driver_queries.core import _planner

    q = (
        'SELECT last("value") FROM "view" '
        f"WHERE time >= '{FROM_T}' AND time <= '{TO_T}' "
        "GROUP BY time(1d), location_id, dev_id FILL(none)"
    )
    iq = parse_influxql(q)
    df = _planner(spark, sf_dir).plan(iq.request, now=NOW)
    return df.select(
        F.col("time").cast("long").alias("time"),
        "location_id",
        "dev_id",
        F.col("value").cast("double").alias("value"),
    )

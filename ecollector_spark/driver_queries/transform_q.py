"""End-to-end DefaultTransform check (SURVEY T1-T12, F2, F3): FIMP-shaped
events through the full transform, oracle-matched branch by branch.

The oracle computes the expected datapoints directly from ``events`` —
independent reimplementation of the transform semantics in SQL, which is
exactly what the value-hash should pin: measurement naming, unit
normalization (kW x1000), the 30 kW guard dropping whole events, energy /
session / meter_ext fan-out with the reference's series-id quirks,
thermostat str_map parse, price-forecast array explode with event-time
override, val_t dispatch, and ecollector self-traffic suppression.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecollector_spark.driver_queries import register
from ecollector_spark.sources.fimp_adapter import fimp_from_events
from ecollector_spark.transform import default_transform

_U = "CAST(user_id AS VARCHAR)"
_FE = "CAST(floor(epoch(ts)) AS BIGINT)"
_NULLS = "CAST(NULL AS BOOLEAN) AS value_b, CAST(NULL AS VARCHAR) AS value_s"

_ORACLE = f"""
WITH e AS (SELECT * FROM events)
-- purchase -> power report (W / kW x1000, >30kW dropped)
SELECT 'electricity_meter_power' AS measurement, {_FE} AS time,
       'electricity_meter_power;electricity_meter_power;' || {_U} || ';import' AS series_id,
       'import' AS dir,
       CASE WHEN user_id%2=0 THEN value*50 ELSE value*1000 END AS value_f,
       {_NULLS},
       CASE WHEN user_id%2=0 THEN 'W' ELSE 'kW' END AS unit, 'mean' AS agg_func
FROM e WHERE event_type='purchase'
  AND (CASE WHEN user_id%2=0 THEN value*50 ELSE value*1000 END) <= 30000
UNION ALL
-- click (non-session) -> energy + energy_sampled twin
SELECT 'electricity_meter_energy', {_FE},
       'electricity_meter_energy;electricity_meter_energy;' || {_U} || ';import',
       'import', value, {_NULLS}, 'kWh', 'mean'
FROM e WHERE event_type='click' AND user_id%3<>0
UNION ALL
SELECT 'electricity_meter_energy_sampled', {_FE},
       'electricity_meter_energy;' || {_U} || ';import',
       'import', value, {_NULLS}, 'kWh', 'difference'
FROM e WHERE event_type='click' AND user_id%3<>0
UNION ALL
-- click (chargepoint session) -> sampled/sum + generic point
SELECT 'electricity_meter_energy_sampled', {_FE},
       'electricity_meter_energy_sampled;' || {_U} || ';import',
       'import', value, {_NULLS}, 'kWh', 'sum'
FROM e WHERE event_type='click' AND user_id%3=0
UNION ALL
SELECT 'chargepoint.evt.current_session.report', {_FE},
       'chargepoint.evt.current_session.report;electricity_meter_energy_sampled;' || {_U} || ';import',
       'import', value, {_NULLS}, 'kWh', 'mean'
FROM e WHERE event_type='click' AND user_id%3=0
UNION ALL
-- error (meter_ext float_map) -> e_import/e_export/p_import fan-out,
-- whole event dropped when p_import > 30kW
SELECT 'electricity_meter_energy', {_FE},
       'electricity_meter_energy;' || {_U} || ';import',
       'import', value, {_NULLS}, 'kWh', 'last'
FROM e WHERE event_type='error' AND user_id%5<>0 AND value*200 <= 30000
UNION ALL
SELECT 'electricity_meter_energy_sampled', {_FE},
       'electricity_meter_energy_sampled;' || {_U} || ';import',
       'import', value, {_NULLS}, 'kWh', 'difference'
FROM e WHERE event_type='error' AND user_id%5<>0 AND value*200 <= 30000
UNION ALL
SELECT 'electricity_meter_energy', {_FE},
       'electricity_meter_energy;' || {_U} || ';export',
       'export', value/2, {_NULLS}, 'kWh', 'last'
FROM e WHERE event_type='error' AND user_id%5<>0 AND user_id%2=0 AND value*200 <= 30000
UNION ALL
SELECT 'electricity_meter_energy_sampled', {_FE},
       'electricity_meter_energy_sampled;' || {_U} || ';export',
       'export', value/2, {_NULLS}, 'kWh', 'difference'
FROM e WHERE event_type='error' AND user_id%5<>0 AND user_id%2=0 AND value*200 <= 30000
UNION ALL
SELECT 'electricity_meter_power', {_FE},
       'electricity_meter_power;' || {_U} || ';import',
       'import', value*200, {_NULLS}, 'W', 'mean'
FROM e WHERE event_type='error' AND user_id%5<>0 AND value*200 <= 30000
UNION ALL
-- error (price forecast) -> one point per array element, event time = startsAt
SELECT 'electricity_price_info',
       CAST(epoch(date_trunc('hour', ts) + INTERVAL 1 HOUR) AS BIGINT),
       'electricity_price_info;' || {_U}, 'export', value/100,
       CAST(NULL AS BOOLEAN), CASE WHEN value > 100 THEN 'HIGH' ELSE 'LOW' END,
       'NOK', 'mean'
FROM e WHERE event_type='error' AND user_id%5=0
UNION ALL
SELECT 'electricity_price_info',
       CAST(epoch(date_trunc('hour', ts) + INTERVAL 2 HOUR) AS BIGINT),
       'electricity_price_info;' || {_U}, 'export', value/50,
       CAST(NULL AS BOOLEAN), CASE WHEN value > 100 THEN 'HIGH' ELSE 'LOW' END,
       'NOK', 'mean'
FROM e WHERE event_type='error' AND user_id%5=0
UNION ALL
-- signup -> thermostat setpoint str_map
SELECT 'thermostat.cmd.setpoint.set', {_FE},
       'thermostat.cmd.setpoint.set;' || {_U}, CAST(NULL AS VARCHAR), value,
       CAST(NULL AS BOOLEAN), 'heat', 'C', 'mean'
FROM e WHERE event_type='signup'
UNION ALL
-- view -> generic val_t dispatch (ecollector uid%7=0 suppressed)
SELECT 'sensor_temp.evt.sensor.report', {_FE},
       'sensor_temp.evt.sensor.report;' || {_U}, CAST(NULL AS VARCHAR), value,
       CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR), 'C', 'mean'
FROM e WHERE event_type='view' AND user_id%7<>0 AND user_id%4=0
UNION ALL
SELECT 'sensor_temp.evt.sensor.report', {_FE},
       'sensor_temp.evt.sensor.report;' || {_U}, CAST(NULL AS VARCHAR),
       CAST(NULL AS DOUBLE), value > 50, CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), 'mean'
FROM e WHERE event_type='view' AND user_id%7<>0 AND user_id%4=1
UNION ALL
SELECT 'sensor_temp.evt.sensor.report', {_FE},
       'sensor_temp.evt.sensor.report;' || {_U}, CAST(NULL AS VARCHAR),
       CAST(NULL AS DOUBLE), CAST(NULL AS BOOLEAN),
       'lvl_' || CAST(CAST(floor(value) AS BIGINT) AS VARCHAR),
       CAST(NULL AS VARCHAR), 'mean'
FROM e WHERE event_type='view' AND user_id%7<>0 AND user_id%4=2
UNION ALL
SELECT 'sensor_temp.evt.sensor.report', {_FE},
       'sensor_temp.evt.sensor.report;' || {_U}, CAST(NULL AS VARCHAR),
       0.0, CAST(NULL AS BOOLEAN), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), 'mean'
FROM e WHERE event_type='view' AND user_id%7<>0 AND user_id%4=3
ORDER BY 1, 2, 3
"""


@register("fimp_transform_pipeline", _ORACLE)
def fimp_transform_pipeline(spark, sf_dir):
    fimp = fimp_from_events(spark, sf_dir)
    dp = default_transform(fimp)
    out = dp.select(
        "measurement",
        F.unix_timestamp("ts").alias("time"),
        "series_id",
        "dir",
        "value_f",
        "value_b",
        "value_s",
        "unit",
        "agg_func",
    )
    # No result ordering: the harness value-hash is order-insensitive,
    # and production never sorts the point stream.
    return out

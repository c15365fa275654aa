"""Driver gates for the storage boundary: the parquet sink (S4), the
canonical CSV sink (S7), and the tai64n batch replay loader (S3).

Round-3 verdict item #2: these three were pytest-only because "a DuckDB
oracle cannot express a sink" — but it can express a sink's *output*:
write real points through the real sink into a scratch directory, read
the files back, and let the oracle compute what the files must contain
directly from the source table. That puts the full write path — tier
routing (mapping.go:146-154), partition layout, the canonical 11-column
CSV shape (storage/csv.go:22), value/timestamp fidelity through
parquet and CSV encode/decode — onto the rows+schema+hash signal.

The replay gate writes a deterministic tai64n MQTT log derived from the
events table (driver-side formatting of a bounded sample — the same
sanctioned harness pattern as streaming_q), parses it back with
sources/replay.py, and the oracle recomputes every parsed field from
``events`` (reference batch_loader.go:28-87; tai64n = hex(2^62+secs) ||
hex(nanos)).
"""

from __future__ import annotations

import json
import math
import os
import tempfile

from pyspark.sql import functions as F

from ecollector_spark.driver_queries import register
from ecollector_spark.sources.events_adapter import read_events
from ecollector_spark.sources.replay import TAI64_OFFSET, read_tai64n_log
from ecollector_spark.tiers import TIERS
from ecollector_spark.warehouse import Warehouse, write_csv

# ---------------------------------------------------------------------------
# shared deterministic events -> datapoints mapping (expression-only; the
# measurements are chosen to land in three different TTL tiers so the
# write-side routing CASE is actually exercised)
# ---------------------------------------------------------------------------

_MEAS_SQL = """CASE event_type
  WHEN 'purchase' THEN 'electricity_meter_power'
  WHEN 'click' THEN 'electricity_meter_energy_sampled'
  WHEN 'view' THEN 'sensor_temp.evt.sensor.report'
  WHEN 'signup' THEN 'sensor_presence.evt.presence.report'
  ELSE 'thermostat.evt.setpoint.report' END"""

#: write_retention_col (mapping.go:146-154) in SQL: sampled energy pins
#: gen_year, high-frequency (named meters + sensor_* minus
#: presence/contact) pins gen_raw, the rest gen_default
_TIER_SQL = """CASE
  WHEN m = 'electricity_meter_energy_sampled' THEN 'gen_year'
  WHEN m IN ('electricity_meter_power', 'electricity_meter_energy',
             'electricity_meter_ext')
       OR (m LIKE '%sensor\\_%' ESCAPE '\\'
           AND m NOT LIKE '%sensor\\_presence%' ESCAPE '\\'
           AND m NOT LIKE '%sensor\\_contact%' ESCAPE '\\') THEN 'gen_raw'
  ELSE 'gen_default' END"""


def _sink_points(spark, sf_dir, modulus: int):
    ev = read_events(spark, sf_dir).where(F.col("user_id") % modulus == 0)
    meas = F.expr(_MEAS_SQL)
    dev = F.col("user_id").cast("string")
    return ev.select(
        meas.alias("measurement"),
        F.col("ts"),
        F.concat(meas, F.lit(";"), dev, F.lit(";import")).alias("series_id"),
        dev.alias("dev_id"),
        F.lit("sensor.generic").alias("dev_type"),
        F.lit("import").alias("dir"),
        (F.col("user_id") % 5).cast("string").alias("location_id"),
        F.split(meas, "\\.").getItem(0).alias("service"),
        F.lit("replay").alias("src"),
        F.concat(F.lit("t/"), dev).alias("topic"),
        F.lit("site").alias("domain"),
        F.col("value").alias("value_f"),
        F.lit(None).cast("boolean").alias("value_b"),
        F.lit(None).cast("string").alias("value_s"),
        F.lit("W").alias("unit"),
        F.lit("mean").alias("agg_func"),
    )


_POINTS_CTE = """WITH p AS (
  SELECT {m} AS m, ts, user_id, value FROM events WHERE user_id % {mod} = 0
)"""


@register(
    "sink_parquet_roundtrip",
    _POINTS_CTE.format(m=_MEAS_SQL, mod=7)
    + f"""
SELECT m AS measurement, {_TIER_SQL} AS tier,
       CAST(floor(epoch(ts)) AS BIGINT) AS time,
       m || ';' || CAST(user_id AS VARCHAR) || ';import' AS series_id,
       CAST(user_id AS VARCHAR) AS dev_id,
       value AS value_f, 'W' AS unit, 'mean' AS agg_func
FROM p""",
)
def sink_parquet_roundtrip(spark, sf_dir):
    """S4 write sink as a value gate: events -> datapoints ->
    ``Warehouse.write_points`` (tier stamped by write_retention_col,
    partitioned tier/measurement parquet) -> read every tier back.
    The oracle computes the identical rows *including the tier each
    point must have landed in* from the source table, so a routing or
    fidelity bug in the write path is a hash mismatch.
    [reference: storage write path influxdb_v1.go:142-176 +
    mapping.go:146-154]"""
    pts = _sink_points(spark, sf_dir, 7)
    root = tempfile.mkdtemp(prefix="ec_sink_pq_")
    wh = Warehouse(spark, os.path.join(root, "wh"))
    wh.write_points(pts)
    out = None
    for tier in TIERS:
        df = wh.read_tier(tier)
        if df is None:
            continue
        out = df if out is None else out.unionByName(df)
    return out.select(
        "measurement",
        "tier",
        F.unix_timestamp("ts").alias("time"),
        "series_id",
        "dev_id",
        "value_f",
        "unit",
        "agg_func",
    )


@register(
    "sink_csv_canonical",
    _POINTS_CTE.format(m=_MEAS_SQL, mod=9)
    + """
SELECT m AS name, CAST(floor(epoch(ts)) AS BIGINT) AS time,
       CAST(user_id AS VARCHAR) AS dev_id, 'sensor.generic' AS dev_type,
       'import' AS dir, CAST(user_id % 5 AS VARCHAR) AS location_id,
       str_split(m, '.')[1] AS service, 'replay' AS src,
       't/' || CAST(user_id AS VARCHAR) AS topic,
       value AS value, 'W' AS unit
FROM p""",
    shelved=True,  # rotated out r9 (family keeps a main-gate twin)
)
def sink_csv_canonical(spark, sf_dir):
    """S7 CSV sink as a value gate: points through ``write_csv`` (the
    reference's canonical 11-column flat file, storage/csv.go:22-113),
    read back with the canonical schema. Numeric fidelity is checked by
    casting the CSV ``value`` text back to double — pinning the encode/
    decode roundtrip without pinning a cross-engine float-to-string
    format."""
    pts = _sink_points(spark, sf_dir, 9)
    path = os.path.join(tempfile.mkdtemp(prefix="ec_sink_csv_"), "out")
    write_csv(pts, path)
    schema = (
        "name string, time long, dev_id string, dev_type string, dir string, "
        "location_id string, service string, src string, topic string, "
        "value string, unit string"
    )
    back = spark.read.option("header", True).schema(schema).csv(path)
    return back.withColumn("value", F.col("value").cast("double"))


_REPLAY_TOPIC = "pt:j1/mt:evt/rt:dev/rn:zw/ad:1/sv:meter_elec/ad:"
_REPLAY_TYPES = {
    "purchase": "evt.meter.report",
    "click": "evt.meter_ext.report",
    "view": "evt.sensor.report",
    "signup": "evt.presence.report",
    "error": "evt.setpoint.report",
}
_REPLAY_TYPE_SQL = (
    "CASE event_type WHEN 'purchase' THEN 'evt.meter.report' "
    "WHEN 'click' THEN 'evt.meter_ext.report' WHEN 'view' THEN 'evt.sensor.report' "
    "WHEN 'signup' THEN 'evt.presence.report' ELSE 'evt.setpoint.report' END"
)


@register(
    "replay_tai64n_load",
    f"""
SELECT '{_REPLAY_TOPIC}' || CAST(user_id AS VARCHAR) AS topic,
       {_REPLAY_TYPE_SQL} AS type,
       'meter_elec' AS serv, 'int' AS val_t,
       CAST(floor(value * 1000) AS BIGINT) AS val_i,
       epoch_us(ts) AS time_us,
       'e' || CAST(event_id AS VARCHAR) AS uid
FROM events WHERE user_id % 17 = 0""",
)
def replay_tai64n_load(spark, sf_dir):
    """S3 batch replay loader as a value gate: a tai64n MQTT log is
    written from a bounded sample of events (label = hex(2^62 + secs) ||
    hex(nanos), daemontools TAI64N; nanos carry the event's microsecond
    component so the sub-second parse path is exercised), then parsed
    back by ``sources/replay.read_tai64n_log``. The oracle recomputes
    topic/type/serv/val_t/val/event-time(µs)/uid straight from
    ``events`` — so hex decode, the 2^62 offset, nanosecond
    reconstruction, and the FIMP envelope parse are all value-checked.
    [reference: cli/batch_loader.go:28-87]"""
    import calendar

    ev = read_events(spark, sf_dir).where(F.col("user_id") % 17 == 0)
    rows = ev.select("event_id", "ts", "user_id", "event_type", "value").collect()
    tmp = tempfile.mkdtemp(prefix="ec_replay_")
    log_path = os.path.join(tmp, "mqtt.log")
    with open(log_path, "w") as f:
        for r in rows:
            ts = r["ts"]
            secs = calendar.timegm(ts.timetuple())
            nanos = ts.microsecond * 1000
            env = {
                "topic": f"{_REPLAY_TOPIC}{r['user_id']}",
                "type": _REPLAY_TYPES.get(r["event_type"], "evt.setpoint.report"),
                "serv": "meter_elec",
                "val_t": "int",
                "val": str(int(math.floor(r["value"] * 1000))),
                "src": "replay",
                "uid": f"e{r['event_id']}",
            }
            f.write(f"@{TAI64_OFFSET + secs:016x}{nanos:08x} {json.dumps(env)}\n")
    parsed = read_tai64n_log(spark, log_path)
    return parsed.select(
        "topic",
        "type",
        "serv",
        "val_t",
        F.col("val").cast("bigint").alias("val_i"),
        F.unix_micros("ts").alias("time_us"),
        "uid",
    )


# ---------------------------------------------------------------------------
# A11 routing split as a value gate (mapping.go:156-168 + process.go:154-178)
# ---------------------------------------------------------------------------

_HF_SQL = """(m IN ('electricity_meter_power', 'electricity_meter_energy',
             'electricity_meter_ext', 'electricity_meter_energy_sampled')
       OR (m LIKE '%sensor\\_%' ESCAPE '\\'
           AND m NOT LIKE '%sensor\\_presence%' ESCAPE '\\'
           AND m NOT LIKE '%sensor\\_contact%' ESCAPE '\\'))"""


@register(
    "routing_branches",
    _POINTS_CTE.format(m=_MEAS_SQL, mod=5)
    + f"""
SELECT m AS measurement,
       m || ';' || CAST(user_id AS VARCHAR) || ';import' AS series_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS time,
       value AS value_f,
       CASE WHEN user_id % 2 = 0 THEN 'difference' ELSE 'mean' END AS agg_func,
       CASE WHEN NOT {_HF_SQL} THEN 'raw'
            WHEN user_id % 2 = 0 THEN 'diff' ELSE 'preagg' END AS branch
FROM p""",
)
def routing_branches(spark, sf_dir):
    """A11 high/low-frequency routing on the value signal: points routed
    through the REAL ``route_points`` split (raw = low-frequency direct
    write, preagg = high-frequency non-difference, diff = difference
    directives), re-unioned with their branch label; the oracle
    recomputes the classification (mapping.go:156-168) and the
    directive split (process.go:154-178) in SQL. Branches must be
    disjoint and total or the row count itself mismatches."""
    from ecollector_spark.streaming.pipeline import route_points

    pts = _sink_points(spark, sf_dir, 5).withColumn(
        "agg_func",
        F.when(F.col("dev_id").cast("long") % 2 == 0, "difference").otherwise("mean"),
    )
    branches = route_points(pts)
    out = None
    for name in ("raw", "preagg", "diff"):
        b = branches[name].select(
            "measurement",
            "series_id",
            F.unix_timestamp("ts").alias("time"),
            "value_f",
            "agg_func",
            F.lit(name).alias("branch"),
        )
        out = b if out is None else out.unionByName(b)
    return out

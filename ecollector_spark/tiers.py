"""Retention tiers and query-side tier routing.

The reference keeps data in six InfluxDB retention policies and routes
each query to the cheapest pre-aggregated tier (reference
src/integration/tsdb/storage/mapping.go, influxdb_v1.go:45-78,115-140).
Here a tier is a partition value of the warehouse (``tier=gen_raw/...``),
and routing is a pure function the planner consults before building the
DataFrame — the Spark analogue of materialized-view selection. Partition
pruning then guarantees a routed query only scans its tier.

Thresholds are ported exactly (semantics, not code) from mapping.go:
- durations: day=24h, week=7d, month=4w (mapping.go:10-13)
- elapsed-time routing (mapping.go:29-45): >12mo -> gen_year,
  >1mo -> gen_month, >1w -> gen_week, >1d -> gen_day, else gen_raw
- tier native granularity (mapping.go:63-78): day=1m, week=10m,
  month=1h, year=1d
- group-by-time routing (mapping.go:85-102): >=1d -> gen_year,
  >=1h -> gen_month, >=10m -> gen_week, >=1m -> gen_day, else gen_raw
- write routing (mapping.go:146-154): energy_sampled -> gen_year (so
  pre-aggregated energy never expires early), high-frequency -> gen_raw,
  else gen_default
- high-frequency classification (mapping.go:156-168)
- retention TTLs (influxdb_v1.go:45-57)
- downsampling cascade steps (influxdb_v1.go:72-78)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ecollector_spark.functions.timeutil import parse_relative_duration

DAY = 86400
WEEK = 7 * DAY
MONTH = 4 * WEEK  # reference uses 4-week months (mapping.go:13)

PROFILE_RAW = "raw"
PROFILE_SIMPLE = "simple"
PROFILE_OPTIMIZED = "optimized"

TIERS = ("gen_raw", "gen_day", "gen_week", "gen_month", "gen_year", "gen_default")

#: TTL per tier in seconds (influxdb_v1.go:45-57; README.md:16-22)
TIER_TTL_SECONDS = {
    "gen_raw": 2 * WEEK,
    "gen_day": 2 * WEEK,
    "gen_week": 12 * WEEK,
    "gen_month": 48 * WEEK,
    "gen_year": 240 * WEEK,
    "gen_default": 12 * WEEK,
}

#: native pre-aggregation granularity of each tier in seconds
#: (mapping.go:63-78; 0 = raw resolution)
TIER_GRANULARITY_SECONDS = {
    "gen_raw": 0,
    "gen_day": 60,
    "gen_week": 600,
    "gen_month": 3600,
    "gen_year": DAY,
    "gen_default": 0,
}

#: named continuous-query stages (influxdb_v1.go:72-78 registers each
#: cascade step as a named CQ; cmd.tsdb.delete_object object_type=cq
#: removes one by this name, admin.go:363-364)
CQ_STAGES = {
    "raw_to_day": ("gen_raw", "gen_day", "1m"),
    "day_to_week": ("gen_day", "gen_week", "10m"),
    "week_to_month": ("gen_week", "gen_month", "1h"),
    "month_to_year": ("gen_month", "gen_year", "1d"),
}

#: downsampling cascade (influxdb_v1.go:72-78): (source, target, step)
CASCADE = tuple(CQ_STAGES.values())


def is_high_frequency(measurement: str) -> bool:
    """mapping.go:156-168: electricity meter measurements and sensor_*
    (except presence/contact) are high-frequency."""
    if measurement in (
        "electricity_meter_power",
        "electricity_meter_energy",
        "electricity_meter_ext",
        "electricity_meter_energy_sampled",
    ) or "sensor_" in measurement:
        if "sensor_presence" in measurement or "sensor_contact" in measurement:
            return False
        return True
    return False


def is_high_frequency_col(measurement: Column) -> Column:
    """Column-expression twin of :func:`is_high_frequency` for routing whole
    DataFrames (ingest side, A11)."""
    m = measurement
    named = m.isin(
        "electricity_meter_power",
        "electricity_meter_energy",
        "electricity_meter_ext",
        "electricity_meter_energy_sampled",
    )
    sensor = m.contains("sensor_") & ~m.contains("sensor_presence") & ~m.contains("sensor_contact")
    return named | sensor


def resolve_retention_by_elapsed(elapsed_seconds: float, profile: str = PROFILE_OPTIMIZED) -> str:
    """mapping.go:29-45."""
    if profile != PROFILE_OPTIMIZED:
        return "gen_raw"
    if elapsed_seconds > 12 * MONTH:
        return "gen_year"
    if elapsed_seconds > 1 * MONTH:
        return "gen_month"
    if elapsed_seconds > 1 * WEEK:
        return "gen_week"
    if elapsed_seconds > 1 * DAY:
        return "gen_day"
    return "gen_raw"


def resolve_retention_by_time_group(group_by_time: str, profile: str = PROFILE_OPTIMIZED) -> str:
    """mapping.go:85-102."""
    if profile != PROFILE_OPTIMIZED:
        return "gen_raw"
    d = parse_relative_duration(group_by_time)
    if d >= DAY:
        return "gen_year"
    if d >= 3600:
        return "gen_month"
    if d >= 600:
        return "gen_week"
    if d >= 60:
        return "gen_day"
    return "gen_raw"


def resolve_write_retention(measurement: str, profile: str = PROFILE_OPTIMIZED) -> str:
    """mapping.go:146-154."""
    if measurement == "electricity_meter_energy_sampled" and profile == PROFILE_OPTIMIZED:
        return "gen_year"
    if is_high_frequency(measurement):
        return "gen_raw"
    return "gen_default"


def write_retention_col(measurement: Column, profile: str = PROFILE_OPTIMIZED) -> Column:
    """Column twin of :func:`resolve_write_retention` — stamps the `tier`
    partition column during ingest so the writer's ``partitionBy`` lands
    every point in its TTL tier with zero extra shuffle."""
    if profile == PROFILE_OPTIMIZED:
        sampled = measurement == "electricity_meter_energy_sampled"
    else:
        sampled = F.lit(False)
    return (
        F.when(sampled, "gen_year")
        .when(is_high_frequency_col(measurement), "gen_raw")
        .otherwise("gen_default")
    )


@dataclass(frozen=True)
class TierChoice:
    tier: str
    granularity_seconds: int


def choose_query_tier(
    measurement: str,
    relative_time: str = "",
    from_time_elapsed_seconds: float | None = None,
    group_by_time: str = "",
    data_function: str = "",
    profile: str = PROFILE_OPTIMIZED,
) -> TierChoice:
    """Query-side tier routing — the planner's materialized-view selection.

    Mirrors influxdb_v1.go:115-140: low-frequency measurements pin
    gen_default; absolute ranges route by elapsed-time-to-`from`; relative
    ranges route by elapsed time, then *upgrade* to the tier matching the
    requested ``group_by_time`` when the user's bucket is at least as
    coarse as the tier's native granularity and the function is ``mean``
    (coarser tier = fewer rows scanned for an identical answer).
    """
    if not is_high_frequency(measurement):
        return TierChoice("gen_default", 0)
    if from_time_elapsed_seconds is not None:
        tier = resolve_retention_by_elapsed(from_time_elapsed_seconds, profile)
        return TierChoice(tier, TIER_GRANULARITY_SECONDS[tier])
    elapsed = parse_relative_duration(relative_time)
    tier = resolve_retention_by_elapsed(elapsed, profile)
    native = TIER_GRANULARITY_SECONDS[tier]
    user = parse_relative_duration(group_by_time)
    if user >= native and data_function == "mean":
        tier = resolve_retention_by_time_group(group_by_time, profile)
    return TierChoice(tier, TIER_GRANULARITY_SECONDS[tier])

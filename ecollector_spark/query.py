"""Structured query planner — the Spark twin of the reference's
``GetDataPoints`` (reference src/integration/tsdb/storage/influxdb_v1.go:
97-200 and src/api/types.go:8-21).

The reference compiles its request struct to an InfluxQL *string* and ships
it to InfluxDB; the planner here compiles the same struct to a DataFrame
plan — Catalyst is the query engine the reference never had. Each stage is
a pure function, so tier routing, predicates, aggregation and gap-fill are
all unit-testable without I/O.

Planner pipeline (matching influxdb_v1.go step for step):
  defaults -> tier routing (tiers.choose_query_tier) -> scan chosen tier
  (partition-pruned) -> time + tag predicates (pushed to parquet) ->
  bucket/tag aggregation -> optional transform wrap (abs/difference) ->
  gap fill -> order by time.

Output schema is the reference's wire shape: ``time`` = epoch seconds
(bigint — influxdb_v1.go:191 uses precision "s"), ``value`` = double,
plus the group-by tag column when requested.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ecollector_spark import tiers
from ecollector_spark.functions.timeutil import parse_relative_duration, time_bucket
from ecollector_spark.gapfill import gap_fill


@dataclass
class DataPointsFilter:
    """Tag predicates (reference storage/influxdb_v1.go:18-23).

    The reference's devices/locations/dev_types loops iterate *indices*
    (``for v := range filter.Devices``) — a bug producing ``dev_id='0'``;
    per SURVEY §2.2 F4 the intent is value-equality, so lists compile to
    ``IN`` predicates here.
    """

    tags: dict = field(default_factory=dict)
    devices: list = field(default_factory=list)
    locations: list = field(default_factory=list)
    dev_types: list = field(default_factory=list)
    #: hand-written InfluxQL surface beyond the reference's generated
    #: equality predicates (public InfluxDB docs): ``tag != 'v'`` and
    #: ``tag =~ /re/`` / ``tag !~ /re/``
    neg_tags: dict = field(default_factory=dict)
    regex_tags: dict = field(default_factory=dict)
    neg_regex_tags: dict = field(default_factory=dict)


@dataclass
class DataPointsRequest:
    """Mirror of GetDataPointsRequest (src/api/types.go:8-21)."""

    measurement_name: str
    field_name: str = "value"
    data_function: str = ""
    transform_function: str = ""
    relative_time: str = ""
    #: optional relative UPPER bound (hand-written InfluxQL windowed
    #: relative ranges: ``time > now()-24h AND time < now()-1h``); the
    #: reference struct has no such field, so "" keeps full parity
    relative_to_time: str = ""
    from_time: str = ""  # RFC3339
    to_time: str = ""  # RFC3339
    group_by_time: str = ""  # e.g. "30m"
    group_by_tag: str = ""
    fill_type: str = ""
    filters: DataPointsFilter = field(default_factory=DataPointsFilter)


_AGG_BUILDERS = {
    "mean": lambda v, ts: F.avg(v),
    "sum": lambda v, ts: F.sum(v),
    "min": lambda v, ts: F.min(v),
    "max": lambda v, ts: F.max(v),
    "count": lambda v, ts: F.count(v).cast("double"),
    "median": lambda v, ts: F.expr(f"percentile({v}, 0.5)"),
    # InfluxQL last() = value of the most recent point in the bucket
    "last": lambda v, ts: F.max_by(v, ts),
    "first": lambda v, ts: F.min_by(v, ts),
}


def _parse_rfc3339(s: str) -> datetime:
    return datetime.fromisoformat(s.replace("Z", "+00:00"))


def split_group_tags(group_by_tag: str) -> list[str]:
    """``group_by_tag`` holds one tag (the reference struct,
    types.go:8-21) or a comma-separated list (hand-written InfluxQL
    ``GROUP BY time(1h), tag1, tag2``). One splitter everywhere so the
    planner, serializer and result-shape clauses agree."""
    return [t.strip().strip('"') for t in group_by_tag.split(",") if t.strip()]


class QueryPlanner:
    """Compiles DataPointsRequest -> DataFrame.

    ``tier_reader(tier) -> DataFrame`` abstracts the warehouse: the real
    warehouse returns the tier's partition (pruned scan); tests and the
    driver's single-table datasets return one DataFrame for every tier.
    A reader accepting ``(tier, from_epoch, to_epoch)`` (e.g.
    ``Warehouse.read_tier`` over a dated layout) additionally receives
    the query's resolved time bounds so day partitions prune before the
    row-exact ``ts`` predicate applies.
    """

    def __init__(self, tier_reader, profile: str = tiers.PROFILE_OPTIMIZED):
        self.tier_reader = tier_reader
        self.profile = profile
        import inspect

        try:
            self._reader_takes_bounds = (
                len(inspect.signature(tier_reader).parameters) >= 3
            )
        except (TypeError, ValueError):
            self._reader_takes_bounds = False

    # -- planning ----------------------------------------------------------
    def plan(self, req: DataPointsRequest, now: datetime | None = None) -> DataFrame:
        now = now or datetime.now(timezone.utc)
        now_epoch = int(now.timestamp())

        # defaults (influxdb_v1.go:102-114)
        group_by_time = "" if req.group_by_time == "auto" else req.group_by_time
        field_name = req.field_name or "value"
        data_function = req.data_function
        if (req.group_by_tag or group_by_time) and not data_function:
            data_function = "mean"
        fill_type = req.fill_type or "null"

        # time range (influxdb_v1.go:119-139)
        if req.from_time and req.to_time:
            from_epoch = int(_parse_rfc3339(req.from_time).timestamp())
            to_epoch = int(_parse_rfc3339(req.to_time).timestamp())
            choice = tiers.choose_query_tier(
                req.measurement_name,
                from_time_elapsed_seconds=now_epoch - from_epoch,
                profile=self.profile,
            )
        else:
            rel = parse_relative_duration(req.relative_time)
            from_epoch, to_epoch = now_epoch - rel, now_epoch
            choice = tiers.choose_query_tier(
                req.measurement_name,
                relative_time=req.relative_time,
                group_by_time=group_by_time,
                data_function=data_function,
                profile=self.profile,
            )
        # windowed relative range (time > now()-A AND time < now()-B):
        # resolved against the same `now`; exclusive upper, like InfluxQL
        rel_to_epoch = (
            now_epoch - parse_relative_duration(req.relative_to_time)
            if req.relative_to_time
            else None
        )
        if rel_to_epoch is not None:
            # the fill spine ends where the data can: the last bucket
            # starting strictly before the relative upper bound
            to_epoch = rel_to_epoch - 1

        if self._reader_takes_bounds:
            # Only pass bounds the planner's own row predicate applies:
            # the plain relative-time shape is `time > now()-rel` with NO
            # upper bound (influxdb_v1.go:138), so a bounds-aware reader
            # must not add ts <= now — future-stamped points (clock skew,
            # replay) would silently differ between reader kinds. A
            # windowed relative range DOES have an upper row predicate,
            # so its bound flows through for day pruning.
            if req.from_time and req.to_time:
                lower, upper = from_epoch, to_epoch
            else:
                # a lone `time < now()-B` has no lower row predicate
                lower = from_epoch if (req.relative_time or rel_to_epoch is None) else None
                upper = rel_to_epoch  # None for the open-ended shape
            df = self.tier_reader(choice.tier, lower, upper)
        else:
            df = self.tier_reader(choice.tier)
        df = df.where(F.col("measurement") == req.measurement_name)
        ts_epoch = F.unix_timestamp("ts")
        if req.from_time and req.to_time:
            df = df.where((ts_epoch >= from_epoch) & (ts_epoch <= to_epoch))
        else:
            if req.relative_time or rel_to_epoch is None:
                df = df.where(ts_epoch > from_epoch)
            if rel_to_epoch is not None:
                df = df.where(ts_epoch < rel_to_epoch)

        # tag predicates (influxdb_v1.go:145-156; list bug fixed to IN)
        flt = req.filters
        for k, v in flt.tags.items():
            df = df.where(F.col(k) == v)
        for k, v in flt.neg_tags.items():
            # InfluxDB's != matches series where the tag exists and
            # differs; NULL (tag absent) does not match — Spark's <>
            # null-propagation already gives that semantics
            df = df.where(F.col(k) != v)
        for k, v in flt.regex_tags.items():
            df = df.where(F.col(k).rlike(v))
        for k, v in flt.neg_regex_tags.items():
            df = df.where(~F.col(k).rlike(v))
        if flt.devices:
            df = df.where(F.col("dev_id").isin(flt.devices))
        if flt.locations:
            df = df.where(F.col("location_id").isin(flt.locations))
        if flt.dev_types:
            df = df.where(F.col("dev_type").isin(flt.dev_types))

        value_col = {"value": "value_f"}.get(field_name, field_name)
        tag = req.group_by_tag
        tag_cols = split_group_tags(tag)
        step = parse_relative_duration(group_by_time)

        # selector shapes (influxdb_v1.go:159-188). NB the reference's
        # tag-only shape selects the RAW field (series organized by tag,
        # no aggregation) even though dataFunction defaults to mean — the
        # default only applies to bucketed shapes. An *explicitly*
        # requested function with a tag (no buckets) is our extension:
        # whole-range aggregate per tag value.
        if not step and not req.data_function:
            out = df.select(
                ts_epoch.alias("time"),
                *[F.col(t) for t in tag_cols],
                F.col(value_col).alias("value"),
            )
            return out.orderBy("time", *tag_cols)

        group_cols = tag_cols
        agg_builder = _AGG_BUILDERS.get(data_function or "mean")
        if agg_builder is None and data_function != "difference":
            raise ValueError(f"unsupported data_function: {data_function!r}")

        if step:
            bucket = time_bucket("ts", step).alias("time")
            base_func = "last" if data_function == "difference" else (data_function or "mean")
            agg = df.groupBy(bucket, *group_cols).agg(
                _AGG_BUILDERS[base_func](value_col, "ts").alias("value")
            )
            if data_function == "difference":
                w = Window.partitionBy(*group_cols).orderBy("time")
                agg = agg.withColumn("value", F.col("value") - F.lag("value").over(w)).where(
                    F.col("value").isNotNull()
                )
        else:
            # aggregate over the whole range (optionally per tag); like
            # InfluxQL, the result row is stamped with the range start
            agg = df.groupBy(*group_cols).agg(agg_builder(value_col, "ts").alias("value"))
            agg = agg.select(F.lit(from_epoch).cast("long").alias("time"), *group_cols, "value")

        # transform wrap (influxdb_v1.go:184-186): f(g(field))
        if req.transform_function == "abs":
            agg = agg.withColumn("value", F.abs(F.col("value")))
        elif req.transform_function == "difference":
            w = Window.partitionBy(*group_cols).orderBy("time")
            agg = agg.withColumn("value", F.col("value") - F.lag("value").over(w)).where(
                F.col("value").isNotNull()
            )
        elif req.transform_function:
            raise ValueError(f"unsupported transform_function: {req.transform_function!r}")

        if step and req.transform_function != "difference" and data_function != "difference":
            agg = gap_fill(
                agg,
                fill_type,
                from_epoch,
                to_epoch,
                step,
                group_cols,
            )
        return agg.select(
            F.col("time").cast("long").alias("time"),
            *group_cols,
            F.col("value").cast("double").alias("value"),
        ).orderBy("time", *group_cols)

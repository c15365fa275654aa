"""Canonical schemas for the engine.

The reference's only explicit flat schema is the CSV sink header
(`name,time,dev_id,dev_type,dir,location_id,service,src,topic,value,unit` —
reference src/integration/tsdb/storage/csv.go:22); its stored model is an
InfluxDB point (tags map + fields map + time). We canonicalize that into a
fixed columnar schema (FIXTURES.md §3): typed value columns instead of
InfluxDB's per-field dynamic typing, plain string tag columns (prunable,
partitionable) instead of a map.

At 100 TB the datapoints table is the big fact table; `tier` and
`measurement` are partition columns so tier routing and measurement
predicates become partition pruning, never a scan.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# FIMP input event (reference: fimpgo/message.go:41-56, FIXTURES.md §1)
# ---------------------------------------------------------------------------
FIMP_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("serv", T.StringType()),
        T.StructField("val_t", T.StringType()),
        # polymorphic payload kept as JSON text; decoded per val_t at
        # transform time with from_json (reference decodes lazily too).
        T.StructField("val", T.StringType()),
        T.StructField("props", T.MapType(T.StringType(), T.StringType())),
        T.StructField("src", T.StringType()),
        T.StructField("ctime", T.TimestampType()),
        T.StructField("uid", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Device metadata dimension (reference: src/metadata/interface.go:7-12)
# ---------------------------------------------------------------------------
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("device_id", T.IntegerType()),
        T.StructField("location_id", T.IntegerType()),
        T.StructField("device_type", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Canonical stored datapoint (FIXTURES.md §3)
# ---------------------------------------------------------------------------
DATAPOINT_SCHEMA = T.StructType(
    [
        T.StructField("measurement", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("series_id", T.StringType()),
        T.StructField("dev_id", T.StringType()),
        T.StructField("dev_type", T.StringType()),
        T.StructField("dir", T.StringType()),
        T.StructField("location_id", T.StringType()),
        T.StructField("service", T.StringType()),
        T.StructField("src", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("value_f", T.DoubleType()),
        T.StructField("value_b", T.BooleanType()),
        T.StructField("value_s", T.StringType()),
        T.StructField("unit", T.StringType()),
        # ingest-internal: routes the point through the streaming
        # pre-aggregator (reference agreggator.go:13-19)
        T.StructField("agg_func", T.StringType()),
        T.StructField("tier", T.StringType()),
    ]
)

DATAPOINT_TAG_COLUMNS = (
    "dev_id",
    "dev_type",
    "dir",
    "location_id",
    "service",
    "topic",
    "domain",
)

# Partition layout for the warehouse: tier first (coarse, 6 values), then
# measurement (hundreds), then date. Queries always pin tier+measurement,
# so partition pruning cuts the scan to exactly the data the tier routing
# chose — the Spark equivalent of InfluxDB retention-policy addressing.
WAREHOUSE_PARTITION_COLUMNS = ("tier", "measurement")

AGG_FUNCS = ("mean", "last", "min", "max", "difference", "sum")

"""ecollector_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of thingsplex/ecollector.

The reference (/root/reference, Go) is an IoT time-series collector: MQTT
FIMP events -> filter -> metadata enrichment -> transform to tagged data
points -> streaming pre-aggregation -> tiered InfluxDB storage, plus a small
structured query API compiled to InfluxQL.

This engine re-expresses those semantics Spark-first:

- ingest/transform = declarative DataFrame expressions (Catalyst-optimized,
  whole-stage codegen; no Python row UDFs in the hot path),
- streaming = Structured Streaming (file/kafka source, watermarks,
  applyInPandasWithState for counter-difference state),
- storage = Parquet/Delta partitioned by retention tier + measurement,
- query API = the reference's structured request compiled to a DataFrame
  plan instead of an InfluxQL string; raw queries are Spark SQL.

Designed for a 1000-executor cluster reading ~100 TB: every operator is
expressed so Catalyst can push filters into the parquet scan, prune
partitions by (tier, measurement, date), broadcast the small dimension
side of enrichment joins, and keep aggregation map-side partial.
"""

__version__ = "0.1.0"

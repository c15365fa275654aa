"""Batch replay loader (S3) — the reference's dead-code batch_loader
(reference src/integration/tsdb/cli/batch_loader.go:28-87) rebuilt live:
replays tai64n-timestamped MQTT log files through the SAME pipeline code
as the stream (``streaming/pipeline.py:build_points`` on a batch frame —
Spark's unified API makes replay the batch mode of the identical plan).

A tai64n log line is ``@<24 hex chars> <json payload>``: the first 16 hex
digits are seconds since epoch offset by 2^62, the next 8 are nanoseconds
(daemontools' external TAI64N format). Parsing is expression-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecollector_spark.schema import FIMP_EVENT_SCHEMA

TAI64_OFFSET = 1 << 62


def parse_tai64n_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """(value: string) log lines -> FIMP event rows with event time from
    the tai64n label (batch replay keeps original event time — reference
    process.go:211-213 intent)."""
    c = F.col(value_col)
    label = F.regexp_extract(c, r"^@([0-9a-fA-F]{24})\s", 1)
    payload = F.regexp_replace(c, r"^@[0-9a-fA-F]{24}\s+", "")
    secs = F.conv(F.substring(label, 1, 16), 16, 10).cast("long") - F.lit(TAI64_OFFSET)
    nanos = F.conv(F.substring(label, 17, 8), 16, 10).cast("long")
    env = F.from_json(payload, FIMP_EVENT_SCHEMA)
    ts = F.timestamp_seconds(secs.cast("double") + nanos / 1e9)
    parsed = lines.where(label != "").select(env.alias("_e"), ts.alias("_ts"))
    return parsed.select(
        F.col("_e.topic").alias("topic"),
        F.col("_e.type").alias("type"),
        F.col("_e.serv").alias("serv"),
        F.col("_e.val_t").alias("val_t"),
        F.col("_e.val").alias("val"),
        F.col("_e.props").alias("props"),
        F.col("_e.src").alias("src"),
        F.col("_ts").alias("ctime"),
        F.col("_e.uid").alias("uid"),
        F.col("_ts").alias("ts"),
    )


def read_tai64n_log(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.text over mqtt log files -> FIMP events (batch)."""
    return parse_tai64n_lines(spark.read.text(path))

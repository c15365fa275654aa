"""Kafka/broker source (S1) — the production stand-in for the reference's
MQTT subscription (reference src/integration/tsdb/process.go:461-463).

An MQTT->Kafka bridge (or EMQX's native Kafka sink) lands each FIMP JSON
envelope as a Kafka record whose value is the payload and whose key/topic
carry the MQTT topic. ``read_kafka_stream`` builds the readStream;
``parse_kafka_records`` is the pure record->event stage, shared with
tests (which feed it a batch DataFrame in Kafka's wire schema, no broker
needed — the parse logic is what needs pinning, not Kafka itself).

Scale: one source partition per Kafka partition; ``maxOffsetsPerTrigger``
bounds micro-batch size (the reference's BatchMaxSize). The parse stage
is map-only; no shuffle until the stateful aggregation keyed later.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecollector_spark.schema import FIMP_EVENT_SCHEMA

#: Kafka's fixed wire schema (what spark-sql-kafka emits)
KAFKA_RECORD_COLUMNS = ("key", "value", "topic", "partition", "offset", "timestamp")


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe: str,
    max_offsets_per_trigger: int | None = None,
    starting_offsets: str = "latest",
) -> DataFrame:
    """readStream from Kafka (requires the spark-sql-kafka connector on
    the classpath; raises Spark's own error otherwise)."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", subscribe)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return parse_kafka_records(r.load())


def parse_kafka_records(records: DataFrame) -> DataFrame:
    """Kafka records -> FIMP event rows.

    - ``value`` (binary) is the FIMP JSON envelope -> from_json once
    - the MQTT topic rides in the record ``key`` (bridge convention);
      falls back to the envelope's own ``topic`` field when the key is
      null, then to the Kafka topic name
    - ``ts`` = envelope ctime, falling back to the Kafka ingest timestamp
      (the reference stamps arrival time, process.go:135)
    """
    env = F.from_json(F.col("value").cast("string"), FIMP_EVENT_SCHEMA)
    parsed = records.select(
        env.alias("_e"),
        F.col("key").cast("string").alias("_key"),
        F.col("topic").alias("_ktopic"),
        F.col("timestamp").alias("_kts"),
    )
    return parsed.select(
        F.coalesce(F.col("_key"), F.col("_e.topic"), F.col("_ktopic")).alias("topic"),
        F.col("_e.type").alias("type"),
        F.col("_e.serv").alias("serv"),
        F.col("_e.val_t").alias("val_t"),
        F.col("_e.val").alias("val"),
        F.col("_e.props").alias("props"),
        F.col("_e.src").alias("src"),
        F.coalesce(F.col("_e.ctime"), F.col("_kts")).alias("ctime"),
        F.col("_e.uid").alias("uid"),
        F.coalesce(F.col("_e.ctime"), F.col("_kts")).alias("ts"),
    )

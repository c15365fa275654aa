"""Structured Streaming pipeline tests.

The stateful operators are golden-matched to the reference's aggregator
tests (reference processing/agreggator_test.go:65-97) and exercised
through a real streaming query: JSON files -> file source -> stateful op
-> memory sink, with a second availableNow run against the same
checkpoint to prove state carries across restarts.
"""

import json
import os

import pytest


def _write_json(path: str, rows: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_stateful(spark, tmp, build, schema: str, rows: list[dict], name: str):
    """One availableNow pass: rows -> json file -> stream -> memory sink."""
    src = f"{tmp}/src_{name}"
    _write_json(f"{src}/part0.json", rows)
    stream = spark.readStream.schema(schema).json(src)
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish"
    q.stop()
    return spark.table(name)


PREAGG_IN = "series_id string, ts timestamp, value_f double, agg_func string"
DIFF_IN = "series_id string, ts timestamp, value_f double, hourly boolean"


def _dp(series, ts, v, func="mean"):
    return {"series_id": series, "ts": ts, "value_f": v, "agg_func": func}


def _dd(series, ts, v, hourly=False):
    return {"series_id": series, "ts": ts, "value_f": v, "hourly": hourly}


class TestPreaggregateStateful:
    def test_directives_and_change_suppression(self, spark, tmp_path):
        from ecollector_spark.streaming.pipeline import preaggregate_stateful

        rows = [
            # s_mean: bucket1 mean 15, bucket2 mean 15 again -> suppressed
            _dp("s_mean", "2024-01-01T00:00:01", 10.0),
            _dp("s_mean", "2024-01-01T00:00:10", 20.0),
            _dp("s_mean", "2024-01-01T00:00:40", 15.0),
            # s_last: keeps most recent (agreggator.go:121-127)
            _dp("s_last", "2024-01-01T00:00:05", 1.0, "last"),
            _dp("s_last", "2024-01-01T00:00:06", 3.0, "last"),
            # s_min / s_max / s_sum
            _dp("s_min", "2024-01-01T00:00:02", 5.0, "min"),
            _dp("s_min", "2024-01-01T00:00:03", 2.0, "min"),
            _dp("s_max", "2024-01-01T00:00:02", 5.0, "max"),
            _dp("s_max", "2024-01-01T00:00:03", 7.0, "max"),
            _dp("s_sum", "2024-01-01T00:00:02", 5.0, "sum"),
            _dp("s_sum", "2024-01-01T00:00:03", 7.0, "sum"),
        ]
        out = _run_stateful(
            spark, str(tmp_path), preaggregate_stateful, PREAGG_IN, rows, "t_preagg"
        )
        got = {
            (r.series_id, r.time.isoformat(), r.value) for r in out.collect()
        }
        assert got == {
            ("s_mean", "2024-01-01T00:00:30", 15.0),
            ("s_last", "2024-01-01T00:00:30", 3.0),
            ("s_min", "2024-01-01T00:00:30", 2.0),
            ("s_max", "2024-01-01T00:00:30", 7.0),
            ("s_sum", "2024-01-01T00:00:30", 12.0),
        }

    def test_first_zero_aggregate_suppressed(self, spark, tmp_path):
        """A new series starts with last_emitted=0 (agreggator.go:134), so
        a first mean of exactly 0.0 never emits."""
        from ecollector_spark.streaming.pipeline import preaggregate_stateful

        rows = [
            _dp("s0", "2024-01-01T00:00:01", 0.0),
            _dp("s0", "2024-01-01T00:00:40", 4.0),
        ]
        out = _run_stateful(
            spark, str(tmp_path), preaggregate_stateful, PREAGG_IN, rows, "t_zero"
        )
        assert [(r.series_id, r.value) for r in out.collect()] == [("s0", 4.0)]

    def test_state_carries_across_restarts(self, spark, tmp_path):
        """Second availableNow run on the same checkpoint sees the carried
        last-emitted value and suppresses an equal aggregate."""
        from ecollector_spark.streaming.pipeline import preaggregate_stateful

        tmp = str(tmp_path)
        src, ckpt, out = f"{tmp}/src", f"{tmp}/ckpt", f"{tmp}/out"
        _write_json(f"{src}/a.json", [_dp("s1", "2024-01-01T00:00:01", 42.0)])

        def run():
            # memory sink can't recover a checkpoint; parquet sink can
            stream = spark.readStream.schema(PREAGG_IN).json(src)
            q = (
                preaggregate_stateful(stream)
                .writeStream.format("parquet")
                .outputMode("append")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            q.stop()
            return sorted(
                (r.time.isoformat(), r.value) for r in spark.read.parquet(out).collect()
            )

        assert run() == [("2024-01-01T00:00:30", 42.0)]
        # same aggregate in a later bucket -> suppressed across restart
        _write_json(f"{src}/b.json", [_dp("s1", "2024-01-01T00:05:01", 42.0)])
        assert run() == [("2024-01-01T00:00:30", 42.0)]
        # a different value emits again
        _write_json(f"{src}/c.json", [_dp("s1", "2024-01-01T00:10:01", 43.0)])
        assert run() == [
            ("2024-01-01T00:00:30", 42.0),
            ("2024-01-01T00:10:30", 43.0),
        ]


class TestCounterDifferenceStateful:
    def test_golden_reset_sequence(self, spark, tmp_path):
        """{10,12,10,20,30} -> 22 (meter reset skipped) — pinned by
        reference agreggator_test.go:72-76."""
        from ecollector_spark.streaming.pipeline import counter_difference_stateful

        rows = [
            _dd("m1", f"2024-01-01T00:0{i}:00", v)
            for i, v in enumerate([10.0, 12.0, 10.0, 20.0, 30.0])
        ]
        out = _run_stateful(
            spark, str(tmp_path), counter_difference_stateful, DIFF_IN, rows, "t_diff1"
        )
        assert [(r.series_id, r.value) for r in out.collect()] == [("m1", 22.0)]

    def test_golden_float_precision(self, spark, tmp_path):
        """{30.9099998474121, 30.9200000762939} -> 0.01000022888180041
        (agreggator_test.go:91-96) — bit-exact float64 arithmetic."""
        from ecollector_spark.streaming.pipeline import counter_difference_stateful

        rows = [
            _dd("m2", "2024-01-01T00:01:00", 30.9099998474121),
            _dd("m2", "2024-01-01T00:02:00", 30.9200000762939),
        ]
        out = _run_stateful(
            spark, str(tmp_path), counter_difference_stateful, DIFF_IN, rows, "t_diff2"
        )
        assert [r.value for r in out.collect()] == [0.01000022888180041]

    def test_zeros_filtered_and_cap(self, spark, tmp_path):
        """Zeros dropped before diff (agreggator.go:327); result >100 kWh
        discarded (agreggator.go:261-264)."""
        from ecollector_spark.streaming.pipeline import counter_difference_stateful

        rows = [
            # s_zero: 0 removed -> [5, 8] -> diff 3
            _dd("s_zero", "2024-01-01T00:01:00", 5.0),
            _dd("s_zero", "2024-01-01T00:02:00", 0.0),
            _dd("s_zero", "2024-01-01T00:03:00", 8.0),
            # s_cap: diff 150 > 100 -> dropped
            _dd("s_cap", "2024-01-01T00:01:00", 100.0),
            _dd("s_cap", "2024-01-01T00:02:00", 250.0),
        ]
        out = _run_stateful(
            spark, str(tmp_path), counter_difference_stateful, DIFF_IN, rows, "t_diff3"
        )
        assert [(r.series_id, r.value) for r in out.collect()] == [("s_zero", 3.0)]

    def test_seed_carries_to_next_bucket(self, spark, tmp_path):
        """The last value of a bucket seeds the next (agreggator.go:258):
        bucket1 [10,12]->2; bucket2 sees [12,15,18]->6."""
        from ecollector_spark.streaming.pipeline import counter_difference_stateful

        rows = [
            _dd("m3", "2024-01-01T00:01:00", 10.0),
            _dd("m3", "2024-01-01T00:05:00", 12.0),
            _dd("m3", "2024-01-01T00:11:00", 15.0),
            _dd("m3", "2024-01-01T00:15:00", 18.0),
        ]
        out = _run_stateful(
            spark, str(tmp_path), counter_difference_stateful, DIFF_IN, rows, "t_diff4"
        )
        got = [(r.time.isoformat(), r.value) for r in out.orderBy("time").collect()]
        assert got == [("2024-01-01T00:10:00", 2.0), ("2024-01-01T00:20:00", 6.0)]

    def test_staleness_evicts_buffer(self, spark, tmp_path):
        """A gap >120 min discards buffer and seed (agreggator.go:236-241):
        the 13:00 bucket has only one usable sample -> no diff."""
        from ecollector_spark.streaming.pipeline import counter_difference_stateful

        rows = [
            _dd("m4", "2024-01-01T00:01:00", 10.0),
            _dd("m4", "2024-01-01T00:05:00", 20.0),
            _dd("m4", "2024-01-01T13:01:00", 50.0),  # 13 h later
        ]
        out = _run_stateful(
            spark, str(tmp_path), counter_difference_stateful, DIFF_IN, rows, "t_diff5"
        )
        got = [(r.time.isoformat(), r.value) for r in out.collect()]
        assert got == [("2024-01-01T00:10:00", 10.0)]

    def test_hourly_profile_time_reattribution(self, spark, tmp_path):
        """Main-meter series: emission stamped previous hour :59
        (agreggator.go:243-246, 307-310); zeros kept (no noise filter) but
        zero *results* suppressed; change-suppression NOT applied."""
        from ecollector_spark.streaming.pipeline import counter_difference_stateful

        rows = [
            _dd("h1", "2024-01-01T05:00:30", 100.0, True),
            _dd("h1", "2024-01-01T05:05:00", 103.0, True),
        ]
        out = _run_stateful(
            spark, str(tmp_path), counter_difference_stateful, DIFF_IN, rows, "t_diff6"
        )
        got = [(r.time.isoformat(), r.value) for r in out.collect()]
        assert got == [("2024-01-01T04:59:00", 3.0)]

    def test_unchanged_suppressed_nonhourly(self, spark, tmp_path):
        """Equal consecutive diff results are suppressed for normal series
        (agreggator.go:266-275)."""
        from ecollector_spark.streaming.pipeline import counter_difference_stateful

        rows = [
            _dd("m5", "2024-01-01T00:01:00", 10.0),
            _dd("m5", "2024-01-01T00:05:00", 12.0),
            _dd("m5", "2024-01-01T00:11:00", 14.0),  # [12, 14] -> 2 again
        ]
        out = _run_stateful(
            spark, str(tmp_path), counter_difference_stateful, DIFF_IN, rows, "t_diff7"
        )
        got = [(r.time.isoformat(), r.value) for r in out.collect()]
        assert got == [("2024-01-01T00:10:00", 2.0)]


class TestEndToEndPipeline:
    def test_file_stream_to_warehouse(self, spark, tmp_path):
        """FIMP JSON files -> filter -> transform -> routed branches ->
        partitioned parquet warehouse, via one availableNow pass."""
        from ecollector_spark.streaming.pipeline import (
            build_points,
            read_fimp_stream,
            route_points,
            write_warehouse_stream,
        )

        tmp = str(tmp_path)
        src = f"{tmp}/events"
        events = [
            {
                "topic": "pt:j1/mt:evt/rt:dev/rn:zw/ad:1/sv:meter_elec/ad:7",
                "type": "evt.meter.report",
                "serv": "meter_elec",
                "val_t": "float",
                "val": "1.5",
                "props": {"unit": "kW"},
                "src": "t",
                "ctime": "2024-01-01T00:00:01",
                "uid": "u1",
            },
            {   # self-traffic: must be dropped (F2)
                "topic": "pt:j1/mt:evt/rt:app/rn:ecollector/ad:1",
                "type": "evt.tsdb.query_report",
                "serv": "ecollector",
                "val_t": "string",
                "val": "\"x\"",
                "props": {},
                "src": "t",
                "ctime": "2024-01-01T00:00:02",
                "uid": "u2",
            },
            {   # low-frequency branch -> raw write
                "topic": "pt:j1/mt:evt/rt:dev/rn:zw/ad:1/sv:out_bin_switch/ad:9",
                "type": "evt.binary.report",
                "serv": "out_bin_switch",
                "val_t": "bool",
                "val": "true",
                "props": {},
                "src": "t",
                "ctime": "2024-01-01T00:00:03",
                "uid": "u3",
            },
        ]
        _write_json(f"{src}/b0.json", events)

        stream = read_fimp_stream(spark, src).withColumn(
            "ts", __import__("pyspark.sql.functions", fromlist=["col"]).col("ctime")
        )
        points = build_points(stream)
        branches = route_points(points)
        q = write_warehouse_stream(
            branches["raw"],
            path=f"{tmp}/warehouse",
            checkpoint=f"{tmp}/ckpt_raw",
            available_now=True,
            query_name="t_e2e_raw",
        )
        assert q.awaitTermination(120)
        q.stop()

        stored = spark.read.parquet(f"{tmp}/warehouse")
        rows = stored.collect()
        # meter power is high-frequency -> not in raw branch; switch is low-freq
        assert [r.measurement for r in rows] == ["out_bin_switch.evt.binary.report"]
        assert rows[0].value_b is True
        assert rows[0].tier == "gen_default"
        # partition layout on disk: tier=.../measurement=...
        assert os.path.isdir(
            f"{tmp}/warehouse/tier=gen_default/measurement=out_bin_switch.evt.binary.report"
        )

    def test_preagg_branch_streaming(self, spark, tmp_path):
        """High-frequency meter events flow through transform then the
        stateful 30 s pre-aggregation (kW -> W normalization included)."""
        from pyspark.sql import functions as F

        from ecollector_spark.streaming.pipeline import (
            build_points,
            preaggregate_stateful,
            read_fimp_stream,
            route_points,
        )

        tmp = str(tmp_path)
        src = f"{tmp}/events"

        def ev(ts, val):
            return {
                "topic": "pt:j1/mt:evt/rt:dev/rn:zw/ad:1/sv:meter_elec/ad:7",
                "type": "evt.meter.report",
                "serv": "meter_elec",
                "val_t": "float",
                "val": str(val),
                "props": {"unit": "kW"},
                "src": "t",
                "ctime": ts,
                "uid": ts,
            }

        _write_json(
            f"{src}/b0.json",
            [ev("2024-01-01T00:00:01", 1.0), ev("2024-01-01T00:00:10", 2.0)],
        )
        metadata = spark.createDataFrame(
            [("/rt:dev/rn:zw/ad:1/sv:meter_elec/ad:7", 7, 1, "meter_elec")],
            "address string, device_id int, location_id int, device_type string",
        )
        stream = read_fimp_stream(spark, src).withColumn("ts", F.col("ctime"))
        branches = route_points(build_points(stream, metadata=metadata))
        q = (
            preaggregate_stateful(branches["preagg"])
            .writeStream.format("memory")
            .queryName("t_e2e_preagg")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()
        got = spark.table("t_e2e_preagg").collect()
        # mean(1000 W, 2000 W) = 1500 W in the 00:00:00 bucket; the series
        # id carries the reference's double-prefix quirk (transform.go:64)
        assert [(r.series_id, r.value) for r in got] == [
            ("electricity_meter_power;electricity_meter_power;7;import", 1500.0)
        ]


class TestDatedStreamSink:
    def test_stream_sink_matches_dated_warehouse_layout(self, spark, tmp_path):
        """A date-partitioned stream sink must land files where a
        Warehouse(date_partition=True) reader expects them."""
        from pyspark.sql import functions as F

        from ecollector_spark.streaming.pipeline import write_warehouse_stream
        from ecollector_spark.warehouse import Warehouse

        rows = [
            {"measurement": "electricity_meter_power", "ts": "2024-01-01T05:00:00",
             "series_id": "s;7;import", "value_f": 1.0},
            {"measurement": "electricity_meter_power", "ts": "2024-01-02T05:00:00",
             "series_id": "s;7;import", "value_f": 2.0},
        ]
        src = str(tmp_path / "src")
        _write_json(f"{src}/in.json", rows)
        schema = "measurement string, ts string, series_id string, value_f double"
        stream = (
            spark.readStream.schema(schema).json(src)
            .withColumn("ts", F.to_timestamp("ts"))
        )
        root = str(tmp_path / "wh")
        q = write_warehouse_stream(
            stream, root, str(tmp_path / "ckpt"),
            available_now=True, date_partition=True,
        )
        assert q.awaitTermination(120)
        q.stop()
        w = Warehouse(spark, root, date_partition=True)
        assert sorted(os.listdir(os.path.join(
            w.tier_path("gen_raw"), "measurement=electricity_meter_power"
        ))) == ["dt=2024-01-01", "dt=2024-01-02"]
        t0 = 1704171600  # 2024-01-02T05:00:00Z
        got = w.read_tier("gen_raw", from_epoch=t0, to_epoch=t0)
        assert [r["value_f"] for r in got.collect()] == [2.0]


class TestKafkaRecordedSegment:
    def test_kafka_segment_matches_mqtt_twin(self, spark, tmp_path):
        """e2e twin-corpus parity (r3 verdict item #5): the SAME recorded
        broker session, once through the MQTT bridge path (landing dir ->
        read_fimp_stream) and once as a recorded Kafka segment (records
        in Kafka's wire schema -> file stream -> parse_kafka_records),
        both through build_points — the sink rows must be identical.
        No broker in the sandbox, so the segment is replayed from files,
        exactly like the MQTT recorded-session replay; the parse +
        transform path IS the code a real Kafka readStream feeds
        [reference subscribe path process.go:455-463]."""
        from datetime import datetime

        from pyspark.sql import functions as F

        from ecollector_spark.sources.kafka_source import parse_kafka_records
        from ecollector_spark.sources.mqtt_bridge import MqttBridge
        from ecollector_spark.streaming.pipeline import build_points, read_fimp_stream
        from tests.test_mqtt_bridge import SESSION

        # --- MQTT twin ---------------------------------------------------
        landing = str(tmp_path / "landing")
        MqttBridge(landing).replay_session(SESSION)
        mq = (
            build_points(
                read_fimp_stream(spark, landing).withColumn("ts", F.col("ctime"))
            )
            .writeStream.format("memory")
            .queryName("t_kafka_twin_mqtt")
            .option("checkpointLocation", str(tmp_path / "ckpt_m"))
            .trigger(availableNow=True)
            .start()
        )
        assert mq.awaitTermination(120)
        mq.stop()

        # --- recorded Kafka segment --------------------------------------
        # (key, value, timestamp) as the MQTT->Kafka bridge lands them:
        # key = MQTT topic, value = raw payload (including the line-noise
        # record, which the parse stage must shed, not crash on)
        seg = [
            (topic.encode(), payload, i, datetime(2024, 1, 1, 0, 0, i + 1))
            for i, (topic, payload) in enumerate(SESSION)
        ]
        segdir = str(tmp_path / "segment")
        spark.createDataFrame(
            [
                {
                    "key": k,
                    "value": v,
                    "topic": "fimp-bridge",
                    "partition": 0,
                    "offset": off,
                    "timestamp": ts,
                }
                for k, v, off, ts in seg
            ],
            "key binary, value binary, topic string, partition int, offset long, timestamp timestamp",
        ).write.mode("overwrite").parquet(segdir)
        records = spark.readStream.schema(
            "key binary, value binary, topic string, partition int, offset long, timestamp timestamp"
        ).parquet(segdir)
        kq = (
            build_points(parse_kafka_records(records))
            .writeStream.format("memory")
            .queryName("t_kafka_twin_kafka")
            .option("checkpointLocation", str(tmp_path / "ckpt_k"))
            .trigger(availableNow=True)
            .start()
        )
        assert kq.awaitTermination(120)
        kq.stop()

        cols = "measurement, series_id, value_f, value_b, value_s, unit"
        a = spark.sql(
            f"SELECT {cols} FROM t_kafka_twin_mqtt ORDER BY measurement, series_id"
        ).collect()
        b = spark.sql(
            f"SELECT {cols} FROM t_kafka_twin_kafka ORDER BY measurement, series_id"
        ).collect()
        assert len(a) > 0 and a == b


class TestStreamDedup:
    def test_qos1_redelivery_dropped(self, spark, tmp_path):
        """Duplicate uids (broker redelivery) collapse to one event in
        the streaming path; distinct uids survive."""
        from pyspark.sql import functions as F

        from ecollector_spark.streaming.pipeline import (
            build_points,
            dedup_stream,
            read_fimp_stream,
        )

        tmp = str(tmp_path)
        base = {
            "topic": "pt:j1/mt:evt/rt:dev/rn:zw/ad:1/sv:sensor_temp/ad:5",
            "type": "evt.sensor.report",
            "serv": "sensor_temp",
            "val_t": "float",
            "val": "21.5",
            "props": {},
            "src": "t",
        }
        events = [
            {**base, "ctime": "2024-01-01T00:00:01", "uid": "m1"},
            {**base, "ctime": "2024-01-01T00:00:01", "uid": "m1"},  # redelivery
            {**base, "ctime": "2024-01-01T00:00:02", "uid": "m2"},
        ]
        _write_json(f"{tmp}/events/b0.json", events)

        stream = read_fimp_stream(spark, f"{tmp}/events").withColumn("ts", F.col("ctime"))
        points = build_points(dedup_stream(stream), watermark=None)
        q = (
            points.writeStream.format("parquet")
            .option("path", f"{tmp}/out")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .queryName("t_dedup_stream")
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()
        rows = spark.read.parquet(f"{tmp}/out").collect()
        assert sorted(r.value_f for r in rows) == [21.5, 21.5]

    def test_batch_frame_dedup(self, spark):
        from ecollector_spark.streaming.pipeline import dedup_stream

        df = spark.createDataFrame(
            [("m1", 1.0), ("m1", 1.0), ("m2", 2.0)], "uid string, v double"
        )
        assert dedup_stream(df).count() == 2


class TestStreamingSessionWindows:
    def test_session_window_streaming_matches_batch(self, spark, tmp_path):
        """F.session_window under a real streaming query (file source,
        watermark, append mode) must close and emit the same sessions the
        batch form produces — the merging-session-state capability
        SURVEY §2.8 claims beyond the reference's tumbling windows.

        Append mode only emits sessions the watermark has closed, so a
        far-future sentinel event on a different user advances the final
        watermark past every real session."""
        from pyspark.sql import functions as F

        rows = [
            # user a: two sessions separated by a 45-min gap
            {"user_id": 1, "ts": "2024-01-01T00:00:00", "value": 1.0},
            {"user_id": 1, "ts": "2024-01-01T00:10:00", "value": 2.0},
            {"user_id": 1, "ts": "2024-01-01T00:55:00", "value": 4.0},
            # user b: one session
            {"user_id": 2, "ts": "2024-01-01T00:05:00", "value": 8.0},
            # sentinel: pushes the watermark far past everything above
            {"user_id": 99, "ts": "2024-01-10T00:00:00", "value": 0.0},
        ]
        schema = "user_id long, ts timestamp, value double"

        def build(stream):
            return (
                stream.withWatermark("ts", "1 minute")
                .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
                .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
                .select(
                    "user_id",
                    F.unix_timestamp("w.start").alias("session_start"),
                    "n_events",
                    "sum_value",
                )
            )

        out = _run_stateful(spark, str(tmp_path), build, schema, rows, "sessions")
        got = {
            (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
            for r in out.collect()
            if r["user_id"] != 99
        }
        batch = spark.createDataFrame(
            [(r["user_id"], r["ts"], r["value"]) for r in rows if r["user_id"] != 99],
            "user_id long, ts string, value double",
        ).select("user_id", F.to_timestamp("ts").alias("ts"), "value")
        expected = {
            (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
            for r in batch.groupBy(
                F.session_window("ts", "30 minutes").alias("w"), "user_id"
            )
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
            .select(
                "user_id",
                F.unix_timestamp("w.start").alias("session_start"),
                "n_events",
                "sum_value",
            )
            .collect()
        }
        assert got == expected
        # the 45-min gap really split user 1 into two sessions
        assert len([k for k in got if k[0] == 1]) == 2
        assert got[(1, 1704067200)] == (2, 3.0)


class TestStatePartitionSizing:
    """r8 (VERDICT r7 #6): the state-store partition count is a
    sized-at-start choice, pinned to the checkpoint by Spark itself."""

    def test_sizing_formula(self, spark):
        from ecollector_spark.streaming.pipeline import (
            size_streaming_state_partitions,
        )

        old = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            # small hint never shrinks below the session default
            assert size_streaming_state_partitions(spark, 1_000) == int(old)
            spark.conf.set("spark.sql.shuffle.partitions", old)
            # 10M series at 50k/partition -> 200 -> next pow2 256
            assert size_streaming_state_partitions(spark, 10_000_000) == 256
            spark.conf.set("spark.sql.shuffle.partitions", old)
            # cap holds
            assert (
                size_streaming_state_partitions(spark, 10_000_000_000) == 4096
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    def test_state_partitions_pinned_by_checkpoint(self, spark, tmp_path):
        """Start a stateful query with a sized partition count, restart
        it under a DIFFERENT session conf: Spark restores the
        checkpointed count (OffsetSeqMetadata), so state layout is
        stable across restarts — the property the sizing helper's
        contract rests on."""
        from ecollector_spark.streaming.pipeline import preaggregate_stateful

        tmp = str(tmp_path)
        src, ckpt, out = f"{tmp}/src", f"{tmp}/ckpt", f"{tmp}/out"
        _write_json(f"{src}/a.json", [_dp("s1", "2024-01-01T00:00:01", 1.0)])
        old = spark.conf.get("spark.sql.shuffle.partitions")

        def run(conf_parts):
            spark.conf.set("spark.sql.shuffle.partitions", str(conf_parts))
            stream = spark.readStream.schema(PREAGG_IN).json(src)
            q = (
                preaggregate_stateful(stream)
                .writeStream.format("parquet")
                .outputMode("append")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            prog = q.lastProgress
            q.stop()
            ops = prog["stateOperators"]
            return ops[0].get("numShufflePartitions") if ops else None

        try:
            assert run(8) == 8  # sized at first start
            _write_json(f"{src}/b.json", [_dp("s1", "2024-01-01T00:05:01", 2.0)])
            # session now says 16; the checkpoint must win
            assert run(16) == 8
            vals = sorted(r.value for r in spark.read.parquet(out).collect())
            assert vals == [1.0, 2.0]
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)


class TestSiteIdOverride:
    """SiteId domain override (r9, VERDICT r8 missing #3 —
    process.go:137-139 + model.go:102): a configured SiteId REPLACES the
    topic-derived global prefix before filtering and tagging."""

    def _events(self, spark, tmp_path):
        import json as _json

        env = {
            "topic": "site_abc/pt:j1/mt:evt/rt:dev/rn:zw/ad:1/sv:meter_elec/ad:7",
            "type": "evt.meter.report",
            "serv": "meter_elec",
            "val_t": "float",
            "val": "2.0",
            "props": {"unit": "W"},
            "src": "t",
            "ctime": "2024-01-01T00:00:01",
            "uid": "u1",
        }
        p = tmp_path / "e.json"
        p.write_text(_json.dumps(env) + "\n")
        from ecollector_spark.schema import FIMP_EVENT_SCHEMA

        ev = spark.read.schema(FIMP_EVENT_SCHEMA).json(str(p))
        from pyspark.sql import functions as F

        return ev.withColumn("ts", F.col("ctime").cast("timestamp"))

    def test_site_id_replaces_topic_domain(self, spark, tmp_path):
        from ecollector_spark.streaming.pipeline import build_points

        ev = self._events(spark, tmp_path)
        # without the override: domain = topic global prefix
        base = build_points(ev).select("domain").distinct().collect()
        assert [r.domain for r in base] == ["site_abc"]
        # with the override: every point carries the configured SiteId
        over = build_points(ev, site_id="site_override").select("domain").distinct().collect()
        assert [r.domain for r in over] == ["site_override"]

    def test_filters_compare_against_the_override(self, spark, tmp_path):
        """The reference applies the override BEFORE pr.filter — a domain
        filter must match the configured SiteId, not the topic prefix."""
        from ecollector_spark.filters import FilterRecord
        from ecollector_spark.streaming.pipeline import build_points

        ev = self._events(spark, tmp_path)
        want_site = [FilterRecord(id=1, domain="site_override")]
        # no override: the domain filter matches nothing
        assert build_points(ev, filters=want_site).count() == 0
        # override set: the same filter passes every event
        assert build_points(ev, filters=want_site, site_id="site_override").count() > 0

    def test_process_config_e2e_through_command_bus(self, spark, tmp_path):
        """cmd.tsdb.proc_add with a SiteId config -> start_fn builds the
        pipeline via pipeline_options -> emitted points carry the
        override (the reference's per-process config path)."""
        from ecollector_spark.streaming.pipeline import build_points, pipeline_options

        ev = self._events(spark, tmp_path)
        opts = pipeline_options(
            {"SiteId": "site_cfg", "Filters": [], "Profile": "optimized", "BatchMaxSize": 500}
        )
        assert opts == {"site_id": "site_cfg"}
        from ecollector_spark.api import ProcessManager

        pm = ProcessManager()
        pm.add("1", {"SiteId": "site_cfg"})
        domains = []

        def start_fn(config):
            pts = build_points(ev, **pipeline_options(config))
            domains.extend(r.domain for r in pts.select("domain").distinct().collect())
            return []

        pm.start("1", start_fn)
        assert domains == ["site_cfg"]

    def test_filters_config_key_builds_records(self):
        from ecollector_spark.filters import FilterRecord
        from ecollector_spark.streaming.pipeline import pipeline_options

        opts = pipeline_options(
            {"Filters": [{"id": 1, "service": "meter_elec"}, FilterRecord(id=2)]}
        )
        assert [f.id for f in opts["filters"]] == [1, 2]
        assert opts["filters"][0].service == "meter_elec"


class TestStreamStreamJoin:
    """stream_interval_join (r9, SURVEY §2.8 extension): watermarked
    stream-stream interval join — batch/stream row-set parity plus the
    state-cleanup contract (the time range lives in the join condition,
    so the symmetric hash state is evictable)."""

    _SCHEMA = "dev string, ts timestamp, v double"

    _L = [
        {"dev": "a", "ts": "2024-01-01T00:00:00Z", "v": 1.0},
        {"dev": "a", "ts": "2024-01-01T01:00:00Z", "v": 2.0},
        {"dev": "b", "ts": "2024-01-01T00:00:00Z", "v": 3.0},
    ]
    _R = [
        {"dev": "a", "ts": "2024-01-01T00:05:00Z", "v": 10.0},  # in window of L1
        {"dev": "a", "ts": "2024-01-01T00:20:00Z", "v": 20.0},  # outside (>10m)
        {"dev": "a", "ts": "2024-01-01T01:09:59Z", "v": 30.0},  # in window of L2
        {"dev": "b", "ts": "2024-01-01T00:00:00Z", "v": 40.0},  # lower bound hit
        {"dev": "c", "ts": "2024-01-01T00:01:00Z", "v": 50.0},  # key never joins
    ]

    def test_stream_batch_parity_and_stateful_plan(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from ecollector_spark.streaming.joins import stream_interval_join

        lsrc, rsrc = f"{tmp_path}/ssj_l", f"{tmp_path}/ssj_r"
        _write_json(f"{lsrc}/part0.json", self._L)
        _write_json(f"{rsrc}/part0.json", self._R)
        ls = spark.readStream.schema(self._SCHEMA).json(lsrc)
        rs = spark.readStream.schema(self._SCHEMA).json(rsrc)
        out = stream_interval_join(
            ls, rs, by=["dev"], upper_seconds=600, watermark="10 minutes"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("ssj")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp_path}/ssj_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish"
        # the join ran as a STATEFUL stream-stream join, not a rewrite
        ops = [
            so["operatorName"]
            for p in q.recentProgress
            for so in p.get("stateOperators", [])
        ]
        q.stop()
        assert "symmetricHashJoin" in ops, ops
        got = {
            (r["dev"], r["v"], r["r_v"])
            for r in spark.table("ssj").collect()
        }
        assert got == {("a", 1.0, 10.0), ("a", 2.0, 30.0), ("b", 3.0, 40.0)}
        # batch parity: identical operator call on static frames
        bl = spark.read.schema(self._SCHEMA).json(lsrc)
        br = spark.read.schema(self._SCHEMA).json(rsrc)
        bout = stream_interval_join(
            bl, br, by=["dev"], upper_seconds=600, watermark="10 minutes"
        )
        bgot = {(r["dev"], r["v"], r["r_v"]) for r in bout.collect()}
        assert bgot == got
        assert bout.columns == ["dev", "ts", "v", "r_ts", "r_v"]

    def test_bad_args_refuse(self, spark):
        from ecollector_spark.streaming.joins import stream_interval_join

        bl = spark.createDataFrame([("a",)], "dev string")
        with pytest.raises(ValueError, match="at least one key"):
            stream_interval_join(bl, bl, by=[])
        with pytest.raises(ValueError, match="empty interval"):
            stream_interval_join(bl, bl, by=["dev"], lower_seconds=5, upper_seconds=1)

    def test_prefix_collision_refuses(self, spark):
        """r10 ADVICE: a left stream already carrying ``r_ts`` would make
        the renamed right ts ambiguous — refuse loudly, and succeed with
        a non-colliding prefix."""
        from datetime import datetime

        from ecollector_spark.streaming.joins import stream_interval_join

        left = spark.createDataFrame(
            [("a", datetime(2024, 1, 1), datetime(2024, 1, 1))],
            "dev string, ts timestamp, r_ts timestamp",
        )
        right = spark.createDataFrame(
            [("a", datetime(2024, 1, 1))], "dev string, ts timestamp"
        )
        with pytest.raises(ValueError, match="collides with left columns"):
            stream_interval_join(left, right, by=["dev"])
        out = stream_interval_join(left, right, by=["dev"], right_prefix="rr_")
        assert out.columns == ["dev", "ts", "r_ts", "rr_ts"]
        assert out.count() == 1

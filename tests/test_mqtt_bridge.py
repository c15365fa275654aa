"""MQTT landing bridge: a recorded broker session replays through the
bridge into the landing dir, and the existing streaming pipeline picks it
up unchanged (reference subscribe path process.go:455-463)."""

import json
import os

from pyspark.sql import functions as F

from ecollector_spark.sources.mqtt_bridge import MqttBridge
from ecollector_spark.streaming.pipeline import build_points, read_fimp_stream


def _envelope(serv, typ, val_t, val, uid, ctime, props=None, topic=""):
    # senders routinely leave the envelope topic empty — the broker
    # message topic is authoritative (bridge stamps it)
    return json.dumps(
        {
            "topic": topic,
            "type": typ,
            "serv": serv,
            "val_t": val_t,
            "val": val,
            "props": props or {},
            "src": "t",
            "ctime": ctime,
            "uid": uid,
            "ver": "1",
        }
    ).encode()


# a recorded broker session: (mqtt topic, raw payload) pairs
SESSION = [
    (
        "pt:j1/mt:evt/rt:dev/rn:zw/ad:1/sv:meter_elec/ad:7",
        _envelope("meter_elec", "evt.meter.report", "float", "1.5",
                  "u1", "2024-01-01T00:00:01", {"unit": "kW"}),
    ),
    (
        "pt:j1/mt:evt/rt:app/rn:ecollector/ad:1",  # self-traffic -> F2 drop
        _envelope("ecollector", "evt.tsdb.query_report", "string", "\"x\"",
                  "u2", "2024-01-01T00:00:02"),
    ),
    (
        "pt:j1/mt:evt/rt:dev/rn:zw/ad:1/sv:out_bin_switch/ad:9",
        _envelope("out_bin_switch", "evt.binary.report", "bool", "true",
                  "u3", "2024-01-01T00:00:03"),
    ),
    ("pt:j1/mt:evt/rt:dev/rn:zw/ad:1/sv:x/ad:1", b"\x00 not json"),  # line noise
]


class TestBridgeCore:
    def test_replay_lands_atomic_files(self, tmp_path):
        d = str(tmp_path / "landing")
        b = MqttBridge(d, rotate_lines=2)  # force a mid-session rotation
        n = b.replay_session(SESSION)
        assert n == 3 and b.dropped == 1
        files = sorted(os.listdir(d))
        assert len(files) == 2  # 2-line file + 1-line tail flush
        assert all(f.startswith("fimp-") and not f.startswith(".") for f in files)
        lines = []
        for f in files:
            with open(os.path.join(d, f)) as fh:
                lines += [json.loads(ln) for ln in fh.read().splitlines()]
        # the MQTT topic overrode the (empty) envelope topic
        assert lines[0]["topic"].endswith("sv:meter_elec/ad:7")
        assert [e["uid"] for e in lines] == ["u1", "u2", "u3"]

    def test_flush_empty_buffer_is_noop(self, tmp_path):
        b = MqttBridge(str(tmp_path / "d"))
        assert b.flush() is None and os.listdir(str(tmp_path / "d")) == []


class TestBridgeToPipeline:
    def test_session_replay_through_streaming_pipeline(self, spark, tmp_path):
        """e2e: broker session -> bridge landing dir -> read_fimp_stream
        -> build_points -> memory sink; the bridge output needs zero
        adaptation on the Spark side."""
        d = str(tmp_path / "landing")
        MqttBridge(d).replay_session(SESSION)

        stream = read_fimp_stream(spark, d).withColumn("ts", F.col("ctime"))
        points = build_points(stream)
        q = (
            points.writeStream.format("memory")
            .queryName("t_bridge_e2e")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()
        rows = spark.sql(
            "SELECT measurement, value_f, value_b FROM t_bridge_e2e ORDER BY measurement"
        ).collect()
        # self-traffic dropped; meter kW -> W; switch bool passthrough
        assert [r.measurement for r in rows] == [
            "electricity_meter_power",
            "out_bin_switch.evt.binary.report",
        ]
        assert rows[0].value_f == 1500.0
        assert rows[1].value_b is True

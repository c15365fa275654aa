"""S3 batch replay loader: tai64n parse + full pipeline in batch mode."""

import json


def _tai64n(secs: int, nanos: int = 0) -> str:
    return "@" + format((1 << 62) + secs, "016x") + format(nanos, "08x")


class TestReplayLoader:
    def test_tai64n_parse_and_pipeline(self, spark, tmp_path):
        from ecollector_spark.sources.replay import read_tai64n_log
        from ecollector_spark.streaming.pipeline import build_points, route_points

        env = {
            "topic": "pt:j1/mt:evt/rt:dev/rn:zw/ad:1/sv:meter_elec/ad:7",
            "type": "evt.meter.report",
            "serv": "meter_elec",
            "val_t": "float",
            "val": "2.0",
            "props": {"unit": "kW"},
            "src": "replay",
            "uid": "u1",
        }
        # 2024-01-01T00:00:00 UTC = 1704067200; second line half a sec later
        log = tmp_path / "mqtt.log"
        log.write_text(
            _tai64n(1704067200) + " " + json.dumps(env) + "\n"
            + _tai64n(1704067200, 500_000_000) + " " + json.dumps({**env, "val": "4.0"}) + "\n"
            + "not a tai64n line\n"
        )
        events = read_tai64n_log(spark, str(log))
        rows = events.orderBy("ts").collect()
        assert len(rows) == 2  # malformed line dropped
        assert rows[0].ts.isoformat() == "2024-01-01T00:00:00"
        assert rows[1].ts.isoformat() == "2024-01-01T00:00:00.500000"

        # the SAME pipeline code runs in batch mode: kW -> W x1000
        points = build_points(events)
        got = {(r.measurement, r.value_f) for r in points.collect()}
        assert ("electricity_meter_power", 2000.0) in got
        assert ("electricity_meter_power", 4000.0) in got
        branches = route_points(points)
        assert branches["preagg"].count() == 2

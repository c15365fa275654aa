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

    def test_tai64n_roundtrip_random_labels(self, spark, tmp_path):
        """Property pin (one Spark pass over 500 seeded-random labels):
        format(secs, nanos) -> parse recovers the instant to Spark's
        microsecond timestamp resolution across the whole epoch range,
        including zero / sub-microsecond / max-nanos cases."""
        import random

        from pyspark.sql import functions as F

        from ecollector_spark.sources.replay import read_tai64n_log

        rng = random.Random(42)
        cases = [(0, 0), (0, 999), (1704067200, 999_999_999), (2**31 - 1, 1)]
        cases += [
            (rng.randrange(0, 2**33), rng.randrange(0, 10**9)) for _ in range(500)
        ]
        env = '{"topic":"t","type":"evt.meter.report","serv":"meter_elec","val_t":"int","val":"%d"}'
        log = tmp_path / "rand.log"
        log.write_text(
            "".join(
                _tai64n(s, n) + " " + (env % i) + "\n"
                for i, (s, n) in enumerate(cases)
            )
        )
        got = {
            int(r["i"]): r["us"]
            for r in read_tai64n_log(spark, str(log))
            .select(F.col("val").alias("i"), F.unix_micros("ts").alias("us"))
            .collect()
        }
        assert len(got) == len(cases)
        for i, (s, n) in enumerate(cases):
            want_us = s * 1_000_000 + n // 1000  # truncation to micros
            assert abs(got[i] - want_us) <= 1, (i, s, n, got[i], want_us)

"""As-of and interval join operator semantics (edge cases the driver
query's data can't guarantee to hit)."""

from datetime import datetime

from pyspark.sql import functions as F

from ecollector_spark.operators.joins import asof_join, interval_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _t(s):
    return datetime.fromisoformat(s)


class TestAsofJoin:
    def test_basic_and_no_match(self, spark):
        left = _df(
            spark,
            [("a", _t("2024-01-01T00:10:00"), 1.0), ("a", _t("2024-01-01T00:30:00"), 2.0),
             ("b", _t("2024-01-01T00:05:00"), 3.0)],
            "k string, ts timestamp, lv double",
        )
        right = _df(
            spark,
            [("a", _t("2024-01-01T00:00:00"), 10.0), ("a", _t("2024-01-01T00:20:00"), 20.0)],
            "k string, ts timestamp, rv double",
        )
        got = {
            (r.k, r.lv): r.rv_asof
            for r in asof_join(left, right, by=["k"], right_values=["rv"]).collect()
        }
        # a@00:10 -> rv 10 (00:00); a@00:30 -> rv 20 (00:20); b -> no match
        assert got == {("a", 1.0): 10.0, ("a", 2.0): 20.0, ("b", 3.0): None}

    def test_equal_timestamp_matches(self, spark):
        left = _df(spark, [("a", _t("2024-01-01T00:20:00"), 1.0)], "k string, ts timestamp, lv double")
        right = _df(spark, [("a", _t("2024-01-01T00:20:00"), 99.0)], "k string, ts timestamp, rv double")
        got = asof_join(left, right, by=["k"], right_values=["rv"]).collect()
        assert got[0].rv_asof == 99.0

    def test_tolerance(self, spark):
        left = _df(spark, [("a", _t("2024-01-01T02:00:00"), 1.0)], "k string, ts timestamp, lv double")
        right = _df(spark, [("a", _t("2024-01-01T00:00:00"), 10.0)], "k string, ts timestamp, rv double")
        loose = asof_join(left, right, by=["k"], right_values=["rv"], tolerance_seconds=7200)
        tight = asof_join(left, right, by=["k"], right_values=["rv"], tolerance_seconds=7199)
        assert loose.collect()[0].rv_asof == 10.0
        assert tight.collect()[0].rv_asof is None

    def test_plan_is_single_shuffle_no_nested_loop(self, spark):
        left = _df(spark, [("a", _t("2024-01-01T00:10:00"), 1.0)], "k string, ts timestamp, lv double")
        right = _df(spark, [("a", _t("2024-01-01T00:00:00"), 10.0)], "k string, ts timestamp, rv double")
        plan = (
            asof_join(left, right, by=["k"], right_values=["rv"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "NestedLoop" not in plan
        assert "Join" not in plan  # union + window: not a join at all


class TestIntervalJoin:
    def test_containment_and_boundaries(self, spark):
        left = _df(
            spark,
            [("a", _t("2024-01-01T00:00:00")), ("a", _t("2024-01-01T00:59:59")),
             ("a", _t("2024-01-01T01:00:00")), ("b", _t("2024-01-01T00:30:00"))],
            "k string, ts timestamp",
        )
        iv = _df(
            spark,
            [("a", _t("2024-01-01T00:00:00"), _t("2024-01-01T01:00:00"), "w1")],
            "k string, start timestamp, end timestamp, tag string",
        )
        got = sorted(
            r.ts.isoformat()
            for r in interval_join(left, iv, by=["k"], bucket_seconds=600).collect()
        )
        # half-open [start, end): 01:00:00 excluded; b has no interval
        assert got == ["2024-01-01T00:00:00", "2024-01-01T00:59:59"]

    def test_overlapping_intervals_fan_out(self, spark):
        left = _df(spark, [("a", _t("2024-01-01T00:30:00"))], "k string, ts timestamp")
        iv = _df(
            spark,
            [("a", _t("2024-01-01T00:00:00"), _t("2024-01-01T01:00:00"), "w1"),
             ("a", _t("2024-01-01T00:15:00"), _t("2024-01-01T00:45:00"), "w2")],
            "k string, start timestamp, end timestamp, tag string",
        )
        got = sorted(r.tag for r in interval_join(left, iv, by=["k"]).collect())
        assert got == ["w1", "w2"]

    def test_no_nested_loop_in_plan(self, spark):
        left = _df(spark, [("a", _t("2024-01-01T00:30:00"))], "k string, ts timestamp")
        iv = _df(
            spark,
            [("a", _t("2024-01-01T00:00:00"), _t("2024-01-01T01:00:00"), "w")],
            "k string, start timestamp, end timestamp, tag string",
        )
        plan = (
            interval_join(left, iv, by=["k"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "NestedLoop" not in plan

"""Golden-value tests for the pure operator cores, pinned to the
reference's own test fixtures (FIXTURES.md §4; agreggator_test.go,
utils_test.go, mapping.go)."""

from ecollector_spark.aggregate import calculate_difference, filter_series_noise
from ecollector_spark.fimp import route_to_regex
from ecollector_spark.functions.timeutil import parse_relative_duration
from ecollector_spark import tiers

import re


class TestCounterDifference:
    # agreggator_test.go:65-97 golden values
    def test_growing(self):
        assert calculate_difference([10, 12, 14, 16, 40]) == 30

    def test_meter_reset(self):
        assert calculate_difference([10, 12, 10, 20, 30]) == 22

    def test_single(self):
        assert calculate_difference([10]) == 0

    def test_empty(self):
        assert calculate_difference([]) == 0

    def test_float_exactness(self):
        got = calculate_difference([30.9099998474121, 30.9200000762939])
        assert got == 0.01000022888180041


class TestOutlierFence:
    def test_golden(self):
        # agreggator_test.go:107-115: 400 is the extreme outlier
        vals = [100, 120, 130, 400, 140, 150]
        assert 400 not in filter_series_noise(vals)
        assert set(filter_series_noise(vals)) == {100, 120, 130, 140, 150}

    def test_zeros_removed(self):
        assert filter_series_noise([0, 5, 6, 0]) == [5, 6]

    def test_short_series_no_fence(self):
        assert filter_series_noise([1, 1000]) == [1, 1000]


class TestDurations:
    def test_units(self):
        assert parse_relative_duration("10m") == 600
        assert parse_relative_duration("2h") == 7200
        assert parse_relative_duration("1d") == 86400
        assert parse_relative_duration("3w") == 3 * 7 * 86400

    def test_empty_and_bad(self):
        assert parse_relative_duration("") == 0
        assert parse_relative_duration("xx") == 0


class TestTierRouting:
    # mapping.go:29-45
    def test_elapsed_routing(self):
        assert tiers.resolve_retention_by_elapsed(3600) == "gen_raw"
        assert tiers.resolve_retention_by_elapsed(2 * 86400) == "gen_day"
        assert tiers.resolve_retention_by_elapsed(8 * 86400) == "gen_week"
        assert tiers.resolve_retention_by_elapsed(5 * tiers.WEEK) == "gen_month"
        assert tiers.resolve_retention_by_elapsed(13 * tiers.MONTH) == "gen_year"

    def test_non_optimized_profile(self):
        assert tiers.resolve_retention_by_elapsed(10**9, "raw") == "gen_raw"

    # mapping.go:85-102
    def test_time_group_routing(self):
        assert tiers.resolve_retention_by_time_group("30s" if False else "") == "gen_raw"
        assert tiers.resolve_retention_by_time_group("1m") == "gen_day"
        assert tiers.resolve_retention_by_time_group("10m") == "gen_week"
        assert tiers.resolve_retention_by_time_group("1h") == "gen_month"
        assert tiers.resolve_retention_by_time_group("1d") == "gen_year"

    # mapping.go:146-168
    def test_write_routing(self):
        assert tiers.resolve_write_retention("electricity_meter_energy_sampled") == "gen_year"
        assert tiers.resolve_write_retention("electricity_meter_power") == "gen_raw"
        assert tiers.resolve_write_retention("sensor_temp.evt.sensor.report") == "gen_raw"
        assert tiers.resolve_write_retention("sensor_presence.evt") == "gen_default"
        assert tiers.resolve_write_retention("anything.else") == "gen_default"

    def test_upgrade_by_group_by_time(self):
        # relative 2d -> gen_day (1m native); user wants 1h mean -> gen_month
        c = tiers.choose_query_tier(
            "electricity_meter_power", relative_time="2d", group_by_time="1h", data_function="mean"
        )
        assert c.tier == "gen_month"
        # non-mean function never upgrades
        c2 = tiers.choose_query_tier(
            "electricity_meter_power", relative_time="2d", group_by_time="1h", data_function="max"
        )
        assert c2.tier == "gen_day"

    def test_low_frequency_pins_default(self):
        c = tiers.choose_query_tier("some_low_freq", relative_time="30w")
        assert c.tier == "gen_default"


class TestTopicRoutes:
    # utils.go:13-41 semantics (utils_test.go pins address splitting)
    CASES = [
        ("pt:j1/mt:evt/#", "pt:j1/mt:evt/rt:dev/rn:zw/ad:1", True),
        ("pt:j1/mt:evt/#", "pt:j1/mt:cmd/rt:dev", False),
        ("pt:j1/+/rt:dev/#", "pt:j1/mt:evt/rt:dev/x/y", True),
        ("a/#", "a", True),
        ("a/#", "ab", False),
        ("a/+/c", "a/b/c", True),
        ("a/+/c", "a/b/c/d", False),
        ("#", "anything/at/all", True),
        ("a/b", "a/b", True),
        ("a/b", "a", False),
    ]

    def test_route_regex(self):
        for route, topic, want in self.CASES:
            got = re.match(route_to_regex(route), topic) is not None
            assert got == want, (route, topic, want)

"""DefaultTransform branch tests (reference transform.go behaviors,
FIXTURES.md §1 event-shape cases 1-9)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from ecollector_spark.transform import default_transform

TS = datetime(2024, 1, 1, 12, 30, tzinfo=timezone.utc)

SCHEMA = (
    "topic string, type string, serv string, val_t string, val string, "
    "props map<string,string>, src string, ts timestamp, dev_id string, "
    "location_id string, dev_type string, domain string"
)


def _ev(spark, *, typ="evt.sensor.report", serv="sensor_temp", val_t="float",
        val="21.5", props=None, dev="7"):
    row = ("t/x", typ, serv, val_t, val, props or {}, "src1", TS, dev, "1", "sensor", "site1")
    return spark.createDataFrame([row], SCHEMA)


def _points(spark, **kw):
    return default_transform(_ev(spark, **kw)).collect()


class TestGenericBranch:
    def test_float_with_unit(self, spark):
        pts = _points(spark, props={"unit": "C"})
        assert len(pts) == 1
        p = pts[0]
        assert p["measurement"] == "sensor_temp.evt.sensor.report"
        assert p["value_f"] == 21.5 and p["unit"] == "C"
        assert p["series_id"] == "sensor_temp.evt.sensor.report;7"
        assert p["agg_func"] == "mean"

    def test_bool(self, spark):
        p = _points(spark, val_t="bool", val="true")[0]
        assert p["value_b"] is True and p["value_f"] is None

    def test_string(self, spark):
        p = _points(spark, val_t="string", val='"hello"')[0]
        assert p["value_s"] == "hello"

    def test_null_becomes_zero(self, spark):
        p = _points(spark, val_t="null", val="null")[0]
        assert p["value_f"] == 0.0

    def test_object_literal(self, spark):
        p = _points(spark, val_t="object", val="{}", serv="other_srv")[0]
        assert p["value_s"] == "object"

    def test_empty_valtype_dropped(self, spark):
        assert _points(spark, val_t="") == []

    def test_ecollector_dropped(self, spark):
        assert _points(spark, serv="ecollector") == []


class TestMeterBranch:
    def test_power_watts(self, spark):
        pts = _points(spark, serv="meter_elec", typ="evt.meter.report",
                      val="1500", props={"unit": "W"})
        assert len(pts) == 1
        p = pts[0]
        assert p["measurement"] == "electricity_meter_power"
        assert p["value_f"] == 1500.0 and p["dir"] == "import"
        # double-prefix quirk (transform.go:64 + 345)
        assert p["series_id"] == "electricity_meter_power;electricity_meter_power;7;import"

    def test_kw_normalized(self, spark):
        p = _points(spark, serv="meter_elec", typ="evt.meter.report",
                    val="1.5", props={"unit": "kW"})[0]
        assert p["value_f"] == 1500.0 and p["unit"] == "kW"  # unit keeps report unit

    def test_power_guard_drops_event(self, spark):
        assert _points(spark, serv="meter_elec", typ="evt.meter.report",
                       val="31", props={"unit": "kW"}) == []

    def test_unknown_unit_drops_event(self, spark):
        assert _points(spark, serv="meter_elec", typ="evt.meter.report",
                       val="5", props={"unit": "XX"}) == []

    def test_energy_fanout(self, spark):
        pts = _points(spark, serv="meter_elec", typ="evt.meter.report",
                      val="42.5", props={"unit": "kWh"})
        by_m = {p["measurement"]: p for p in pts}
        assert set(by_m) == {"electricity_meter_energy", "electricity_meter_energy_sampled"}
        assert by_m["electricity_meter_energy_sampled"]["agg_func"] == "difference"
        assert by_m["electricity_meter_energy_sampled"]["series_id"] == \
            "electricity_meter_energy;7;import"  # reuses energy series (transform.go:67,73)

    def test_session_fanout(self, spark):
        pts = _points(spark, serv="chargepoint", typ="evt.current_session.report", val="3.2")
        by_m = {p["measurement"]: p for p in pts}
        assert by_m["electricity_meter_energy_sampled"]["agg_func"] == "sum"
        assert "chargepoint.evt.current_session.report" in by_m

    def test_meter_ext_fanout(self, spark):
        val = '{"e_import":10.5,"e_export":2.5,"p_import":900.0,"p_export":100.0}'
        pts = _points(spark, serv="meter_elec", typ="evt.meter_ext.report",
                      val_t="float_map", val=val)
        assert len(pts) == 6
        dirs = {(p["measurement"], p["dir"], p["agg_func"]) for p in pts}
        assert ("electricity_meter_energy", "import", "last") in dirs
        assert ("electricity_meter_energy_sampled", "export", "difference") in dirs
        assert ("electricity_meter_power", "export", "mean") in dirs

    def test_meter_ext_guard_drops_all_points(self, spark):
        val = '{"e_import":10.5,"p_import":31000.0}'
        assert _points(spark, serv="meter_elec", typ="evt.meter_ext.report",
                       val_t="float_map", val=val) == []


class TestThermostatAndPrice:
    def test_setpoint(self, spark):
        pts = _points(spark, serv="thermostat", typ="cmd.setpoint.set", val_t="str_map",
                      val='{"temp":"21.5","unit":"C","type":"heat"}')
        p = pts[0]
        assert p["measurement"] == "thermostat.cmd.setpoint.set"
        assert p["value_f"] == 21.5 and p["unit"] == "C" and p["value_s"] == "heat"

    def test_setpoint_bad_temp_dropped(self, spark):
        assert _points(spark, serv="thermostat", typ="cmd.setpoint.set", val_t="str_map",
                       val='{"temp":"abc"}') == []

    def test_price_forecast_explode(self, spark):
        val = (
            '[{"level":"LOW","total":0.5,"energy":0.1,"tax":0.1,"currency":"NOK",'
            '"startsAt":"2024-01-01T13:00:00Z"},'
            '{"level":"HIGH","total":1.5,"energy":0.2,"tax":0.2,"currency":"NOK",'
            '"startsAt":"2024-01-01T14:00:00Z"}]'
        )
        pts = _points(spark, serv="price_info_elec", typ="evt.price_forecast.report",
                      val_t="object", val=val)
        assert len(pts) == 2
        by_level = {p["value_s"]: p for p in pts}
        assert by_level["LOW"]["value_f"] == 0.5
        # event time overridden by startsAt (transform.go:283)
        assert by_level["HIGH"]["ts"] == datetime(2024, 1, 1, 14, 0)
        assert by_level["HIGH"]["dir"] == "export"  # quirk preserved

    def test_price_service_other_type_no_points(self, spark):
        # fields=nil for the whole price_info_elec branch (transform.go:298)
        assert _points(spark, serv="price_info_elec", typ="evt.other", val="5") == []

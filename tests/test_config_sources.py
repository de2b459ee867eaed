"""S3/S4/S5/S6/S7 — file-backed config sources and ensure-table DDL.

The production path loads nested-JSON config files; the registered catalog
queries use equivalent in-memory fixtures. These tests pin the two to the
same frames, exercise hot reload (S6: loaders re-read on every call), and
the write-if-missing table DDL (S7).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from opcua_ingestion_engine_spark import catalog as C
from opcua_ingestion_engine_spark.operators.sink import MODVALUES_DDL, ensure_table
from opcua_ingestion_engine_spark.sources import (
    load_connection_config,
    load_devices_json,
    load_templates_json,
)


def _templates_doc() -> dict:
    """The sos_templates fixture re-expressed in the reference's nested
    deviceType -> templateName -> [point] JSON shape."""
    doc: dict = {}
    for dt in range(4):
        points = []
        for measure, unit, mode, slope, offset, factor, tmin in C._TEMPLATE_POINTS:
            points.append(
                {
                    "tag_name": f"{measure}_raw",
                    "measure_name": measure,
                    "unit": unit,
                    "scale_mode": mode,
                    "slope": slope,
                    "offset": offset,
                    "factor": factor,
                    "target_min": tmin,
                }
            )
        doc[f"type-{dt}"] = {f"tmpl-{dt}": points}
    return doc


def test_s3_templates_json_matches_fixture(spark, tmp_path):
    p = tmp_path / "sos_templates_opcua.json"
    p.write_text(json.dumps(_templates_doc()))
    loaded = load_templates_json(spark, str(p))
    fixture = C.sos_templates(spark)
    cols = fixture.columns
    assert loaded.columns == cols
    a = sorted(map(tuple, loaded.collect()))
    b = sorted(map(tuple, fixture.collect()))
    assert a == b


def test_s4_devices_json_flattens_network_params(spark, tmp_path):
    doc = {
        "type-0": [
            {
                "daq_name": "DEV-001",
                "daq_template": "tmpl-0",
                "monitored": True,
                "prefix": "",
                "point_node": "ns=2;s=DEV-001",
                "network": {"params": {"protocol": "OPCUA", "server": "conn-1"}},
            },
            {
                "daq_name": "DEV-010",
                "daq_template": "tmpl-0",
                "monitored": False,
                "prefix": "",
                "point_node": "ns=2;s=DEV-010",
                "network": {"params": {"protocol": "MODBUS", "server": "conn-1"}},
            },
        ],
        "type-1": [
            {
                "daq_name": "DEV-002",
                "daq_template": "tmpl-1",
                "monitored": True,
                "prefix": "P/",
                "point_node": "ns=2;s=DEV-002",
                "network": {"params": {"protocol": "OPCUA", "server": "conn-2"}},
            }
        ],
    }
    p = tmp_path / "site_devices.json"
    p.write_text(json.dumps(doc))
    df = load_devices_json(spark, str(p))
    rows = {r["daq_name"]: r for r in df.collect()}
    assert set(rows) == {"DEV-001", "DEV-010", "DEV-002"}
    assert rows["DEV-001"]["protocol"] == "OPCUA"
    assert rows["DEV-001"]["server"] == "conn-1"
    assert rows["DEV-010"]["monitored"] is False
    assert rows["DEV-002"]["device_type"] == "type-1"
    assert rows["DEV-002"]["prefix"] == "P/"


def test_s5_connection_string(spark, tmp_path):
    p = tmp_path / "plant_config.json"
    p.write_text(
        json.dumps(
            {
                "host": "db.local",
                "port": 5432,
                "database": "plant",
                "username": "svc",
                "password": "pw",
            }
        )
    )
    cs = load_connection_config(spark, str(p))
    assert cs == "Host=db.local;Port=5432;Database=plant;Username=svc;Password=pw"


def test_s6_hot_reload_sees_file_change(spark, tmp_path):
    """S6 — loaders re-read the file on every call, so a config change is
    visible to the next micro-batch without restarting anything."""
    p = tmp_path / "sos_templates_opcua.json"
    doc = _templates_doc()
    p.write_text(json.dumps(doc))
    assert load_templates_json(spark, str(p)).count() == 20
    doc["type-9"] = {"tmpl-9": doc["type-0"]["tmpl-0"]}
    p.write_text(json.dumps(doc))
    after = load_templates_json(spark, str(p))
    assert after.count() == 25
    assert after.filter(F.col("device_type") == "type-9").count() == 5


def test_config_read_retries_malformed_then_heals(spark, tmp_path, monkeypatch):
    """The S-layer retry (OpcSubscribeService.cs:449-470, x5 with backoff):
    a document that parses to NULL (partial write) is re-read; if the
    writer finishes mid-retry the loader heals, and a perpetually-broken
    file raises instead of yielding an empty catalog."""
    import pytest as _pytest

    from opcua_ingestion_engine_spark.sources import config as S

    bad = tmp_path / "broken.json"
    bad.write_text('{"type-0": {"tmpl-0": [')  # truncated mid-write
    with _pytest.raises(ValueError, match="failed to parse"):
        S.load_templates_json(spark, str(bad), )

    # writer "finishes" during the first backoff sleep. NOTE the global
    # time.sleep patch is also hit by Spark/py4j background threads, so
    # the heal must be atomic (unique temp + os.replace — readers see
    # either the truncated or the full document, never a mid-write state;
    # plain write_text() here raced a reader against its truncate window
    # and flaked) and idempotent.
    import os as _os
    import tempfile as _tempfile

    healing = tmp_path / "healing.json"
    healing.write_text('{"type-0": {')
    good_doc = (
        '{"type-0": {"tmpl-0": [{"tag_name": "click_raw", "measure_name": '
        '"click", "unit": "kW", "scale_mode": "none"}]}}'
    )
    real_sleep = __import__("time").sleep

    def finish_write(_secs):
        fd, tmp = _tempfile.mkstemp(dir=str(tmp_path))
        with _os.fdopen(fd, "w") as f:
            f.write(good_doc)
        _os.replace(tmp, str(healing))

    monkeypatch.setattr("time.sleep", finish_write)
    try:
        out = S.load_templates_json(spark, str(healing))
        assert out.count() == 1
        assert out.first()["measure_name"] == "click"
    finally:
        monkeypatch.setattr("time.sleep", real_sleep)


def test_s7_ensure_table_creates_once(spark, tmp_path):
    path = str(tmp_path / "modvalues")
    assert ensure_table(spark, path) is True
    df = spark.read.parquet(path)
    assert df.count() == 0
    assert df.schema == spark.createDataFrame([], MODVALUES_DDL).schema
    # Second call is a no-op (CREATE TABLE IF NOT EXISTS semantics) and
    # must not clobber data written in between.
    spark.createDataFrame(
        [("DEV-001", "type-0", "t", 1.0, "m", 1.0, "u", "u", "ts", "instant")],
        MODVALUES_DDL,
    ).write.mode("append").parquet(path)
    assert ensure_table(spark, path) is False
    assert spark.read.parquet(path).count() == 1


def test_x4_value_domain_within_decimal18(spark):
    """Pin the ADVICE r1 assumption: the scaling pipeline casts value to
    DECIMAL(18,6), which NULLs on |value| >= 1e12 under non-ANSI Spark
    while DuckDB raises — oracle parity therefore requires the testdata
    value domain to stay far below the bound. Enforce it."""
    from tests.conftest import SF_CORRECT

    ev = C.load_table(spark, SF_CORRECT, "events")
    mx = ev.agg(F.max(F.abs(F.col("value"))).alias("m")).first()["m"]
    assert mx is not None and float(mx) < 1e9, f"value domain too wide: {mx}"

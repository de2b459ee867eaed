"""S13 REST control plane tests — drive the actual HTTP surface with
urllib against a live ThreadingHTTPServer, mirroring the reference's
controller contract (ClientController.cs:22-87, BrowseController.cs:18-25):
200/400 status discipline, decrypt-on-read, ReloadPolling notification
after every successful mutation, fire-and-forget browse jobs."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

KEY = "0123456789abcdef0123456789abcdef"  # 32 bytes -> AES-256


def _req(base: str, method: str, path: str, body: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(f"{base}{path}", data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


@pytest.fixture()
def server(spark, tmp_path):
    from opcua_ingestion_engine_spark.control import (
        ConnectionConfigStore,
        ControlPlaneServer,
    )

    store = ConnectionConfigStore(spark, str(tmp_path / "connections"), KEY)
    reloads = []
    browsed = []

    def browse_fn(conn_id):
        browsed.append(conn_id)
        return f"tree-{conn_id}"

    srv = ControlPlaneServer(
        store,
        reload_hook=lambda: reloads.append(1),
        browse_fn=browse_fn,
    ).start()
    host, port = srv.address
    yield f"http://{host}:{port}", store, reloads, browsed, srv
    srv.stop()


DTO = {
    "connection_name": "plant-a",
    "url": "opc.tcp://10.0.0.5:62541",
    "max_search": 600,
    "timeout_ms": 30000,
    "username": "svc-opc",
    "password": "hunter2-secret",
    "browse_exclusion_folders": ["Server", "Devices"],
}


def test_empty_store_injects_default(server):
    base, *_ = server
    code, body = _req(base, "GET", "/api/client/config/get")
    assert code == 200
    assert len(body) == 1 and body[0]["connection_name"] == "Ignition"
    assert body[0]["url"].endswith("/discovery")


def test_add_get_roundtrip_with_encryption(server):
    base, store, reloads, *_ = server
    code, _ = _req(base, "POST", "/api/client/config/add", DTO)
    assert code == 200 and len(reloads) == 1

    code, body = _req(base, "GET", "/api/client/config/get")
    assert code == 200 and len(body) == 1
    row = body[0]
    assert row["connection_name"] == "plant-a"
    assert row["password"] == "hunter2-secret"  # decrypted for the DTO
    assert row["browse_exclusion_folders"] == ["Server", "Devices"]

    # at rest the password is ciphertext, not plaintext
    stored = store._read().select("encrypted_password").first()[0]
    assert stored is not None and b"hunter2" not in bytes(stored)

    # duplicate name -> 400, no reload (OpcuaHelperService.cs:95-97)
    code, _ = _req(base, "POST", "/api/client/config/add", DTO)
    assert code == 400 and len(reloads) == 1


def test_update_existing_and_missing(server):
    base, _, reloads, *_ = server
    _req(base, "POST", "/api/client/config/add", DTO)

    patch = dict(DTO, timeout_ms=90000, password="rotated-pw")
    code, _ = _req(base, "PATCH", "/api/client/config/update", patch)
    assert code == 200 and len(reloads) == 2

    _, body = _req(base, "GET", "/api/client/config/get")
    assert body[0]["timeout_ms"] == 90000
    assert body[0]["password"] == "rotated-pw"

    # NULL password keeps the stored ciphertext
    code, _ = _req(
        base, "PATCH", "/api/client/config/update",
        dict(DTO, timeout_ms=15000, password=None),
    )
    assert code == 200
    _, body = _req(base, "GET", "/api/client/config/get")
    assert body[0]["timeout_ms"] == 15000 and body[0]["password"] == "rotated-pw"

    code, _ = _req(
        base, "PATCH", "/api/client/config/update",
        dict(DTO, connection_name="nope"),
    )
    assert code == 400


def test_delete_and_conn_id_assignment(server):
    base, *_ = server
    _req(base, "POST", "/api/client/config/add", DTO)
    _req(base, "POST", "/api/client/config/add", dict(DTO, connection_name="plant-b"))
    _, body = _req(base, "GET", "/api/client/config/get")
    assert [r["conn_id"] for r in body] == [0, 1]

    code, _ = _req(base, "DELETE", "/api/client/config/delete/plant-a")
    assert code == 200
    _, body = _req(base, "GET", "/api/client/config/get")
    assert [r["connection_name"] for r in body] == ["plant-b"]

    code, _ = _req(base, "DELETE", "/api/client/config/delete/plant-a")
    assert code == 400

    # ids keep monotonically increasing after a delete (no reuse)
    _req(base, "POST", "/api/client/config/add", dict(DTO, connection_name="plant-c"))
    _, body = _req(base, "GET", "/api/client/config/get")
    assert {r["connection_name"]: r["conn_id"] for r in body} == {
        "plant-b": 1, "plant-c": 2,
    }


def test_browse_job_fire_and_forget(server):
    base, _, _, browsed, srv = server
    code, body = _req(base, "GET", "/api/browse/startBrowseJob/7")
    assert code == 200
    assert body["message"] == "Long-running process started."
    assert body["started"] is True
    assert srv.registry.join("7", timeout=10.0) == "done"
    assert browsed == ["7"]


def test_store_survives_reopen(spark, tmp_path):
    """Config persists across control-plane restarts (it's a table, not
    process memory)."""
    from opcua_ingestion_engine_spark.control import ConnectionConfigStore

    path = str(tmp_path / "connections")
    store = ConnectionConfigStore(spark, path, KEY)
    assert store.add(DTO)
    store2 = ConnectionConfigStore(spark, path, KEY)
    rows = store2.load()
    assert rows[0]["connection_name"] == "plant-a"
    assert rows[0]["password"] == "hunter2-secret"


def test_corrupt_store_fails_loudly_instead_of_wiping(spark, tmp_path):
    """A corrupt table must raise, not read as empty — 'empty' would let
    the next mutation overwrite the config with a near-empty table."""
    import os

    from opcua_ingestion_engine_spark.control import ConnectionConfigStore

    path = str(tmp_path / "connections")
    store = ConnectionConfigStore(spark, path, KEY)
    assert store.add(DTO)

    # corrupt every parquet footer
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            with open(os.path.join(path, name), "r+b") as f:
                f.seek(-8, os.SEEK_END)
                f.write(b"XXXXXXXX")

    with pytest.raises(Exception):
        store.load()
    with pytest.raises(Exception):
        store.add(dict(DTO, connection_name="other"))
    # the corrupt data is still on disk for operator recovery — not wiped
    assert any(n.endswith(".parquet") for n in os.listdir(path))


def test_patch_omitting_folders_keeps_them_explicit_empty_clears(server):
    base, *_ = server
    _req(base, "POST", "/api/client/config/add", DTO)

    # omit the field entirely -> stored folders survive
    code, _ = _req(
        base, "PATCH", "/api/client/config/update",
        {"connection_name": "plant-a", "timeout_ms": 45000},
    )
    assert code == 200
    _, body = _req(base, "GET", "/api/client/config/get")
    assert body[0]["timeout_ms"] == 45000
    assert body[0]["browse_exclusion_folders"] == ["Server", "Devices"]

    # explicit [] clears
    code, _ = _req(
        base, "PATCH", "/api/client/config/update",
        {"connection_name": "plant-a", "browse_exclusion_folders": []},
    )
    assert code == 200
    _, body = _req(base, "GET", "/api/client/config/get")
    assert body[0]["browse_exclusion_folders"] == []


def test_url_encoded_name_roundtrip(server):
    base, *_ = server
    dto = dict(DTO, connection_name="Plant A / main")
    _req(base, "POST", "/api/client/config/add", dto)
    from urllib.parse import quote

    code, _ = _req(
        base, "DELETE", f"/api/client/config/delete/{quote('Plant A / main', safe='')}"
    )
    assert code == 200
    _, body = _req(base, "GET", "/api/client/config/get")
    assert body[0]["connection_name"] == "Ignition"  # back to empty-store default


def test_malformed_json_returns_400_not_dropped_socket(server):
    base, *_ = server
    req = urllib.request.Request(
        f"{base}/api/client/config/add", data=b"not-json", method="POST"
    )
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected HTTPError")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_crash_mid_swap_is_detected_not_read_as_empty(spark, tmp_path):
    import os

    from opcua_ingestion_engine_spark.control import ConnectionConfigStore

    path = str(tmp_path / "connections")
    store = ConnectionConfigStore(spark, path, KEY)
    assert store.add(DTO)
    # simulate a crash between the two renames: table moved to .bak, new
    # table never moved into place
    os.rename(path, path + ".bak")
    with pytest.raises(RuntimeError, match="mid-swap"):
        store.load()
    # recovery per the error message: rename .bak into place
    os.rename(path + ".bak", path)
    assert store.load()[0]["connection_name"] == "plant-a"


def test_read_rechecks_path_after_retry_loop(spark, tmp_path, monkeypatch):
    """A slow writer that completes its swap AFTER the reader's retry loop
    must not make _read return an empty store: the post-loop existence
    re-check has to pick up the just-promoted table (ADVICE r3 #2)."""
    import os
    import time as _time

    from opcua_ingestion_engine_spark.control import ConnectionConfigStore

    path = str(tmp_path / "connections")
    store = ConnectionConfigStore(spark, path, KEY)
    assert store.add(DTO)

    # Freeze the mid-swap state: data moved aside, a .tmp leftover keeps
    # the retry loop spinning.
    os.rename(path, path + ".hold")
    os.mkdir(path + ".tmp")

    calls = {"n": 0}
    real_sleep = _time.sleep

    def finishing_sleep(s):
        calls["n"] += 1
        if calls["n"] == 20:  # the loop's final sleep: writer finishes now
            os.rmdir(path + ".tmp")
            os.rename(path + ".hold", path)
        real_sleep(0)  # don't actually wait out 20 x 50ms

    monkeypatch.setattr(_time, "sleep", finishing_sleep)
    rows = store.load()
    assert calls["n"] >= 20
    assert [r["connection_name"] for r in rows] == [DTO["connection_name"]]


def test_read_tmp_only_leftover_distinguishes_complete_from_torn(
    spark, tmp_path, monkeypatch
):
    """Crash around the .tmp write (fresh store): a COMPLETE tmp
    (_SUCCESS present) may be promoted to roll forward; a tmp WITHOUT
    _SUCCESS is torn (crash mid-parquet-write) and the error must say so
    — advising promotion there would install a torn config store."""
    import os
    import time as _time

    from opcua_ingestion_engine_spark.control import ConnectionConfigStore

    path = str(tmp_path / "connections")
    store = ConnectionConfigStore(spark, path, KEY)
    monkeypatch.setattr(_time, "sleep", lambda s: None)

    os.mkdir(path + ".tmp")  # no _SUCCESS: torn or still being written
    with pytest.raises(RuntimeError, match="INCOMPLETE"):
        store._read()

    open(os.path.join(path + ".tmp", "_SUCCESS"), "w").close()
    with pytest.raises(RuntimeError, match="roll forward"):
        store._read()

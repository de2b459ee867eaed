"""S13 — REST control plane (SURVEY.md §2.1).

The reference exposes a small ASP.NET API over its connection config and
browse jobs (``Controllers/ClientController.cs:22-87``,
``Controllers/BrowseController.cs:18-25``, routes ``api/[controller]``
per ``Controllers/BaseApiController.cs:5-7``):

- ``GET    api/client/config/get``              — list connections, passwords decrypted
- ``POST   api/client/config/add``              — insert-if-absent, password AES-encrypted at rest
- ``PATCH  api/client/config/update``           — update-if-present
- ``DELETE api/client/config/delete/{name}``    — remove by connection name
- ``GET    api/browse/startBrowseJob/{connId}`` — fire-and-forget browse job

Every successful mutation triggers ``ReloadPolling``
(``Services/OpcSubscribeService.cs`` — the S6 hot-reload); the browse
endpoint returns immediately while the job runs async (B5).

Spark-first shape: this module is a THIN stdlib ``http.server`` shell —
no web framework in the container, none needed for a config-sized
control plane — over a :class:`ConnectionConfigStore` whose mutations
are the engine's own MERGE-shaped DataFrame transforms (S10
insert-if-missing for add, S9 keyed-update for update, anti-join for
delete) against a parquet-backed table, with X8 AES-CBC at rest via the
JVM ``aes_encrypt``/``aes_decrypt`` built-ins and the reference's
S8-style default injection on an empty store. The config table is O(10)
rows: driver-side materialization per request is the correct plan at any
scale (the 100 TB side of this engine is the data plane, not this).

The data plane stays decoupled exactly as in the reference: consumers
re-read config per micro-batch (S6), so a control-plane write is visible
at the next trigger without restarting anything.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.browse import BrowseJobRegistry

# Mirrors the reference's injected default when no config exists
# (Services/OpcuaHelperService.cs:72-86).
DEFAULT_CONNECTION = {
    "connection_name": "Ignition",
    "url": "opc.tcp://10.10.100.1:62541/discovery",
    "max_search": 600,
    "timeout_ms": 60000,
    "username": None,
    "password": None,
    "browse_exclusion_folders": [],
}

STORE_SCHEMA = (
    "conn_id int, connection_name string, url string, max_search int, "
    "timeout_ms int, username string, encrypted_password binary, "
    "browse_exclusion_folders array<string>"
)

_DTO_FIELDS = (
    "connection_name", "url", "max_search", "timeout_ms", "username",
    "password", "browse_exclusion_folders",
)


class ConnectionConfigStore:
    """Parquet-backed connection config with AES-encrypted passwords.

    Single-writer by design (one control plane per deployment, like the
    reference's single API process); a process-local lock serializes
    mutations. Readers (the S6 loaders) see the previous version until
    the overwrite commits — config-table-sized windows, same as the
    reference's read-committed Postgres reads.
    """

    def __init__(self, spark: SparkSession, path: str, aes_key: str):
        if len(aes_key.encode("utf-8")) not in (16, 24, 32):
            raise ValueError("aes_key must be 16/24/32 bytes (AES-128/192/256)")
        self.spark = spark
        self.path = path
        self._key = aes_key
        self._lock = threading.Lock()

    # -- plumbing -----------------------------------------------------------

    def _read(self) -> DataFrame:
        # ONLY a never-initialized path means "empty store" — any other
        # failure must propagate: treating it as empty would make the next
        # mutation overwrite the table with a near-empty one (silent
        # config loss). A missing path WITH swap leftovers means a crash
        # mid-_write: fail loudly with the recovery pointer instead of
        # reading empty.
        import os
        import time

        # The two-rename swap in _write has a window where the path does
        # not exist. In-process readers serialize with writers via the
        # store lock (load() takes it); an EXTERNAL reader racing the
        # swap retries briefly — a live writer completes the second
        # rename in milliseconds, so only a genuine crash leaves the
        # missing-path + leftover state standing after the retries.
        for _ in range(20):
            if os.path.exists(self.path):
                return self.spark.read.schema(STORE_SCHEMA).parquet(self.path)
            if not (os.path.exists(self.path + ".bak")
                    or os.path.exists(self.path + ".tmp")):
                return self.spark.createDataFrame([], STORE_SCHEMA)
            time.sleep(0.05)  # mid-swap window — wait it out
        # A slow writer can complete its swap between the loop's last
        # existence check and here — re-check the data path once before
        # concluding anything from the leftovers, else a live store reads
        # as empty (or as a phantom crash).
        if os.path.exists(self.path):
            return self.spark.read.schema(STORE_SCHEMA).parquet(self.path)
        if os.path.exists(self.path + ".bak"):
            raise RuntimeError(
                f"config store {self.path} missing but {self.path}.bak "
                "exists — crashed mid-swap after demoting the previous "
                "version; restore by renaming the .bak (complete previous "
                "version) back into place, or roll forward by renaming the "
                ".tmp (complete new version, also present in this state)"
            )
        if os.path.exists(self.path + ".tmp"):
            # Only a _SUCCESS marker proves the tmp write COMMITTED — a
            # crash mid-parquet-write leaves a partial .tmp, and telling
            # the operator to promote that would install a torn store.
            if os.path.exists(os.path.join(self.path + ".tmp", "_SUCCESS")):
                raise RuntimeError(
                    f"config store {self.path} missing but {self.path}.tmp "
                    "exists and is COMPLETE (_SUCCESS present) — crashed "
                    "after the write, before promotion; rename the .tmp "
                    "into place to roll forward (or delete it to start "
                    "empty)"
                )
            raise RuntimeError(
                f"config store {self.path} missing but {self.path}.tmp "
                "exists and is INCOMPLETE (no _SUCCESS) — either a crash "
                "mid-write or a first-ever write still in flight; if no "
                "writer is alive, delete the .tmp to start empty — do NOT "
                "rename it into place"
            )
        return self.spark.createDataFrame([], STORE_SCHEMA)

    def _write(self, df: DataFrame) -> None:
        # Write-new + swap, never overwrite-in-place: mode("overwrite")
        # deletes the table before committing the replacement, so a crash
        # mid-write would lose the whole config. Here a crash leaves
        # either the old table in place (before the first rename) or a
        # complete .bak next to the new table; _read refuses the
        # ambiguous window instead of reading empty.
        import os
        import shutil

        tmp, bak = self.path + ".tmp", self.path + ".bak"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)  # debris from an earlier failed attempt
        df.localCheckpoint(eager=True).write.mode("overwrite").parquet(tmp)
        if os.path.exists(bak):
            shutil.rmtree(bak)
        if os.path.exists(self.path):
            os.rename(self.path, bak)
        os.rename(tmp, self.path)
        if os.path.exists(bak):
            shutil.rmtree(bak)

    def _encrypt(self, col):
        return F.aes_encrypt(col, F.lit(self._key), F.lit("CBC"))

    def _decrypt(self, col):
        return F.aes_decrypt(col, F.lit(self._key), F.lit("CBC")).cast("string")

    def _dto_frame(self, dto: dict) -> DataFrame:
        # browse_exclusion_folders: omitted/None stays NULL (update keeps
        # the stored list via coalesce); an EXPLICIT [] is preserved and
        # clears the list — coercing None to [] here would silently wipe
        # folders on every PATCH that omits the field.
        row = {k: dto.get(k) for k in _DTO_FIELDS}
        df = self.spark.createDataFrame(
            [
                (
                    row["connection_name"],
                    row["url"],
                    row["max_search"],
                    row["timeout_ms"],
                    row["username"],
                    row["password"],
                    row["browse_exclusion_folders"],
                )
            ],
            "connection_name string, url string, max_search int, timeout_ms int, "
            "username string, password string, browse_exclusion_folders array<string>",
        )
        return df.select(
            "connection_name", "url", "max_search", "timeout_ms", "username",
            F.when(
                F.col("password").isNotNull(), self._encrypt(F.col("password"))
            ).alias("encrypted_password"),
            "browse_exclusion_folders",
        )

    # -- the four verbs -----------------------------------------------------

    def load(self, decrypt: bool = True) -> list[dict]:
        """GET — all connections; passwords decrypted for the DTO exactly
        as the reference does (ClientController.cs:81). Empty store gets
        the injected default row (OpcuaHelperService.cs:72-86) — returned,
        not persisted, same as the reference. Takes the store lock: the
        threaded HTTP server serves GETs concurrently with mutations, and
        an unlocked read could land inside _write's swap window."""
        pw = self._decrypt(F.col("encrypted_password")) if decrypt else F.lit(None)
        # collect() INSIDE the lock — the DataFrame is lazy, so the file
        # read happens at collect time, and only then is the swap window
        # actually excluded
        with self._lock:
            rows = [
                r.asDict()
                for r in self._read().select(
                    "conn_id", "connection_name", "url", "max_search",
                    "timeout_ms", "username", pw.alias("password"),
                    "browse_exclusion_folders",
                )
                .orderBy("conn_id")
                .collect()
            ]
        if not rows:
            return [dict(DEFAULT_CONNECTION, conn_id=0)]
        return rows

    def add(self, dto: dict) -> bool:
        """POST — S10 insert-if-missing on connection_name; False (-> 400)
        when the name exists (OpcuaHelperService.cs:91-116)."""
        if not dto.get("connection_name"):
            return False
        with self._lock:
            cur = self._read()
            if (
                cur.filter(
                    F.col("connection_name") == dto["connection_name"]
                ).limit(1).count()
                > 0
            ):
                return False
            next_id = cur.agg(
                F.coalesce(F.max("conn_id") + 1, F.lit(0)).alias("i")
            ).first()["i"]
            incoming = (
                self._dto_frame(dto)
                .withColumn("conn_id", F.lit(int(next_id)).cast("int"))
                # a NEW row with no folders stores [], not NULL
                .withColumn(
                    "browse_exclusion_folders",
                    F.coalesce(
                        F.col("browse_exclusion_folders"),
                        F.array().cast("array<string>"),
                    ),
                )
            )
            self._write(cur.unionByName(incoming.select(*cur.columns)))
            return True

    def update(self, dto: dict) -> bool:
        """PATCH — S9 update-if-present keyed on connection_name; False
        (-> 400) when absent (OpcuaHelperService.cs:118-147). A NULL
        incoming password keeps the stored ciphertext (the reference only
        re-encrypts when one is supplied)."""
        with self._lock:
            cur = self._read()
            inc = self._dto_frame(dto).select(
                "connection_name",
                *[
                    F.col(c).alias(f"_new_{c}")
                    for c in (
                        "url", "max_search", "timeout_ms", "username",
                        "encrypted_password", "browse_exclusion_folders",
                    )
                ],
            )
            if (
                cur.join(inc, "connection_name", "left_semi").limit(1).count() == 0
            ):
                return False
            merged = cur.join(inc, "connection_name", "left")
            for c in ("url", "max_search", "timeout_ms", "username",
                      "browse_exclusion_folders"):
                merged = merged.withColumn(
                    c, F.coalesce(F.col(f"_new_{c}"), F.col(c))
                )
            merged = merged.withColumn(
                "encrypted_password",
                F.coalesce(F.col("_new_encrypted_password"), F.col("encrypted_password")),
            )
            self._write(merged.select(*cur.columns))
            return True

    def delete(self, connection_name: str) -> bool:
        """DELETE — anti-join on connection_name; False (-> 400) when the
        name wasn't present (OpcuaHelperService.cs:250-272)."""
        with self._lock:
            cur = self._read()
            if (
                cur.filter(F.col("connection_name") == connection_name)
                .limit(1).count() == 0
            ):
                return False
            self._write(cur.filter(F.col("connection_name") != connection_name))
            return True


class ControlPlaneServer:
    """The HTTP shell. ``reload_hook`` runs after every successful
    mutation (the reference's ``ReloadPolling`` notification);
    ``browse_fn(conn_id)`` is launched async through the B5 registry by
    the browse endpoint."""

    def __init__(
        self,
        store: ConnectionConfigStore,
        reload_hook=None,
        browse_fn=None,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.store = store
        self.reload_hook = reload_hook or (lambda: None)
        self.browse_fn = browse_fn
        self.registry = BrowseJobRegistry()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet test runs
                pass

            def _send(self, code: int, body=None):
                data = json.dumps(body if body is not None else {}).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                return json.loads(self.rfile.read(n) or b"{}")

            def _dispatch(self, fn):
                # an exception must become an HTTP status, not a dropped
                # socket: malformed input -> 400, store/engine errors ->
                # 500 (the fail-loudly paths stay diagnosable to clients)
                try:
                    fn()
                except (json.JSONDecodeError, ValueError, KeyError, TypeError) as e:
                    self._send(400, {"error": f"bad request: {e!r}"})
                except Exception as e:  # noqa: BLE001 — HTTP boundary
                    self._send(500, {"error": f"internal error: {e!r}"})

            def do_GET(self):
                def run():
                    if self.path == "/api/client/config/get":
                        return self._send(200, outer.store.load())
                    if self.path.startswith("/api/browse/startBrowseJob/"):
                        conn_id = unquote(self.path.rsplit("/", 1)[-1])
                        started = outer._start_browse(conn_id)
                        return self._send(
                            200,
                            {"message": "Long-running process started.",
                             "started": started},
                        )
                    return self._send(404, {"error": "not found"})

                self._dispatch(run)

            def do_POST(self):
                def run():
                    if self.path == "/api/client/config/add":
                        return outer._mutate(self, outer.store.add, self._body())
                    return self._send(404, {"error": "not found"})

                self._dispatch(run)

            def do_PATCH(self):
                def run():
                    if self.path == "/api/client/config/update":
                        return outer._mutate(
                            self, outer.store.update, self._body()
                        )
                    return self._send(404, {"error": "not found"})

                self._dispatch(run)

            def do_DELETE(self):
                def run():
                    if self.path.startswith("/api/client/config/delete/"):
                        name = unquote(self.path.rsplit("/", 1)[-1])
                        return outer._mutate(self, outer.store.delete, name)
                    return self._send(404, {"error": "not found"})

                self._dispatch(run)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    def _mutate(self, handler, op, arg):
        ok = op(arg)
        if ok:
            self.reload_hook()
            return handler._send(200)
        return handler._send(400, {"error": "rejected"})

    def _start_browse(self, conn_id: str) -> bool:
        if self.browse_fn is None:
            return False
        return self.registry.start(conn_id, lambda: self.browse_fn(conn_id))

    # -- lifecycle ----------------------------------------------------------

    @property
    def address(self) -> tuple[str, int]:
        return self._httpd.server_address[:2]

    def start(self) -> "ControlPlaneServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

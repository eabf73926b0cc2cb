"""`socket_server` / `http_server` inputs — listener → spool → stream.

The reference binds a server IN-PROCESS and feeds accepted payloads
straight into the pipeline (internal/impl/io/input_socket_server.go:35,
input_http_server.go:273). A Spark cluster has no single in-process
ingress — executors come and go — so the scale-correct analog splits
the roles:

1. a LISTENER (driver-side daemon thread) accepts connections/requests
   and appends payloads to a SPOOL directory as atomic files
   (write tmp → rename; readers never see partial files);
2. the SOURCE is a plain checkpointed file stream over the spool, so
   delivery inherits Spark's exactly-once file-source semantics
   (each spool file is consumed once per checkpoint, resumable).

This is the documented lakehouse ingress pattern (listener writes, the
stream tails) rather than a translation of the Go event loop: the
listener is a singleton by nature; the CONSUMPTION is what must scale,
and a file stream scales with partitions. Both listeners report their
bound address (``address`` after ``start()``) so tests/configs can bind
port 0.

Framing: ``socket_server`` splits each connection's bytes on newlines
(the reference's `lines` codec); ``http_server`` turns each POST body
into one message (the reference's `/post` endpoint; 200 on accept,
404 elsewhere, 405 on wrong verb).
"""

from __future__ import annotations

import json
import os
import socketserver
import threading
import uuid
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from benthos_spark.sources.readers import Source

SYNC_META_KEY = "http_server_request_id"


class SyncResponseStore:
    """Driver-side request/reply rendezvous pairing a sync `http_server`
    input with the `sync_response` output — the Spark analog of the
    reference's per-transaction ResultStore
    (internal/transaction/result_store.go:22, wired by
    input_http_server.go:518 and claimed by
    pure/output_sync_response.go:18 via SetAsResponse).

    The handler thread ``register``s the request id before spooling and
    ``wait``s for the pipeline to run; the sink posts the processed
    parts with ``set_result``. Results for ids nobody registered (or
    whose waiter already timed out) are dropped without penalty — the
    reference's contract for sync responses on inputs that don't
    support them. This is a singleton-per-driver object by nature: the
    open HTTP connection that must receive the reply lives on the
    driver, so the rendezvous does too (connection-scale, never
    data-plane-scale)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._waiters: dict[str, list] = {}  # id -> [Event, parts|None, status]

    def register(self, req_id: str) -> None:
        with self._lock:
            self._waiters[req_id] = [threading.Event(), None, 200]

    def set_result(self, req_id: str, parts: list[bytes], status: int = 200) -> bool:
        """Post the pipeline's reply. Returns False when nobody is
        waiting (unregistered / timed-out id) — dropped silently."""
        with self._lock:
            w = self._waiters.get(req_id)
            if w is None:
                return False
            w[1], w[2] = list(parts), status
        w[0].set()
        return True

    def wait(self, req_id: str, timeout_s: float):
        """Block until a result lands or the timeout passes. Returns
        (parts, status) or None. Always removes the waiter entry."""
        with self._lock:
            w = self._waiters.get(req_id)
        if w is None:
            return None
        ok = w[0].wait(timeout_s)
        with self._lock:
            self._waiters.pop(req_id, None)
        return (w[1], w[2]) if ok and w[1] is not None else None


#: Default process-wide store: a YAML config declaring an `http_server`
#: input with sync_response plus a `sync_response` output pairs through
#: this automatically (both run on the one driver, like the reference's
#: one process).
SYNC_STORE = SyncResponseStore()


def _spool_write(spool_dir: str, payload: bytes) -> None:
    """Atomic spool append: tmp write + rename (the file stream must
    never list a partially-written file)."""
    os.makedirs(spool_dir, exist_ok=True)
    name = uuid.uuid4().hex
    tmp = os.path.join(spool_dir, f".tmp-{name}")
    with open(tmp, "wb") as f:
        f.write(payload)
    os.rename(tmp, os.path.join(spool_dir, f"part-{name}.txt"))


class _SpoolSource(Source):
    """Shared read side: a text stream (or bounded text read) over the
    spool directory — one `value` column, one row per line."""

    spool_dir: str
    streaming: bool

    def read(self, spark: SparkSession) -> DataFrame:
        os.makedirs(self.spool_dir, exist_ok=True)
        if getattr(self, "_server", None) is None:
            self.start()
        if self.streaming:
            return spark.readStream.format("text").load(self.spool_dir)
        return spark.read.format("text").load(self.spool_dir)


@dataclass
class SocketServerSource(_SpoolSource):
    """`socket_server` input: listen on TCP, newline-split each
    connection's bytes into messages (input_socket_server.go:35).
    ``start()`` binds (supports port 0) and returns self; ``stop()``
    shuts the listener down. Messages land in ``spool_dir`` and are
    consumed as a checkpointed file stream."""

    address: str = "127.0.0.1:0"
    spool_dir: str = ""
    network: str = "tcp"
    max_buffer: int = 1 << 20
    streaming: bool = True
    _server: object = field(default=None, repr=False)

    def __post_init__(self):
        if self.network != "tcp":
            raise ValueError(f"socket_server network {self.network!r} not supported (tcp only)")
        if not self.spool_dir:
            raise ValueError("socket_server needs a spool_dir")

    def start(self) -> "SocketServerSource":
        host, port = self.address.rsplit(":", 1)
        spool, maxb = self.spool_dir, self.max_buffer

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                buf = b""
                while True:
                    chunk = self.request.recv(65536)
                    if not chunk:
                        break
                    buf += chunk
                    while b"\n" in buf:
                        line, buf = buf.split(b"\n", 1)
                        if line:
                            _spool_write(spool, line[:maxb] + b"\n")
                if buf.strip():
                    _spool_write(spool, buf[:maxb] + b"\n")

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, int(port)), Handler)
        self.address = "%s:%d" % self._server.server_address[:2]
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


@dataclass
class HttpServerSource(_SpoolSource):
    """`http_server` input: accept POSTs on ``path``, each body is one
    message (input_http_server.go:273 `/post` endpoint; 200 on accept,
    404/405 otherwise). Same spool → file-stream consumption.

    ``sync_response=True`` turns each POST into a request/reply
    exchange (input_http_server.go:518 + the `sync_response` output):
    the handler holds the connection open while the message flows
    through the streaming pipeline; a :class:`SyncResponseSink`
    downstream posts the processed payload back and the POST returns it
    as the response body (multipart per RFC 1341 when the reply has
    multiple parts, matching input_http_server.go:612). No reply within
    ``sync_timeout_s`` → 408 "Request timed out"
    (input_http_server.go:527). Sync messages are spooled as one JSON
    line carrying {id, v}; ``read`` unwraps it so the pipeline sees the
    plain ``value`` plus ``_meta[http_server_request_id]`` — the
    correlation travels WITH the message through any shuffle, so the
    processing itself stays fully distributed; only the rendezvous is
    driver-side (where the open socket lives)."""

    address: str = "127.0.0.1:0"
    path: str = "/post"
    spool_dir: str = ""
    max_buffer: int = 1 << 20
    streaming: bool = True
    sync_response: bool = False
    sync_timeout_s: float = 30.0
    store: SyncResponseStore | None = None
    _server: object = field(default=None, repr=False)

    def __post_init__(self):
        if not self.spool_dir:
            raise ValueError("http_server needs a spool_dir")
        if self.store is None:
            self.store = SYNC_STORE

    def read(self, spark: SparkSession) -> DataFrame:
        df = super().read(spark)
        if not self.sync_response:
            return df
        parsed = F.from_json("value", "id string, v string")
        return df.select(
            parsed["v"].alias("value"),
            F.create_map(F.lit(SYNC_META_KEY), parsed["id"])
            .cast("map<string,string>").alias("_meta"),
        )

    def start(self) -> "HttpServerSource":
        host, port = self.address.rsplit(":", 1)
        spool, path, maxb = self.spool_dir, self.path, self.max_buffer
        sync, timeout_s, store = self.sync_response, self.sync_timeout_s, self.store

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                if self.path != path:
                    self.send_response(404)
                    self.end_headers()
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(min(n, maxb))
                if not sync:
                    # one message per request; strip a single trailing
                    # newline so the text-stream row equals the body
                    _spool_write(spool, body.rstrip(b"\n") + b"\n")
                    self.send_response(200)
                    self.end_headers()
                    return
                req_id = uuid.uuid4().hex
                store.register(req_id)
                line = json.dumps(
                    {"id": req_id, "v": body.decode("utf-8", "replace")},
                    ensure_ascii=False)
                _spool_write(spool, line.encode("utf-8") + b"\n")
                got = store.wait(req_id, timeout_s)
                if got is None:
                    self.send_response(408)
                    self.end_headers()
                    self.wfile.write(b"Request timed out")
                    return
                parts, status = got
                self.send_response(status)
                if len(parts) == 1:
                    self.send_header("Content-Type", "application/octet-stream")
                    self.send_header("Content-Length", str(len(parts[0])))
                    self.end_headers()
                    self.wfile.write(parts[0])
                else:
                    boundary = uuid.uuid4().hex
                    buf = b""
                    for p in parts:
                        buf += (f"--{boundary}\r\n"
                                "Content-Type: application/octet-stream\r\n"
                                f"Content-Length: {len(p)}\r\n\r\n").encode() + p + b"\r\n"
                    buf += f"--{boundary}--\r\n".encode()
                    self.send_header(
                        "Content-Type", f"multipart/byteranges; boundary={boundary}")
                    self.send_header("Content-Length", str(len(buf)))
                    self.end_headers()
                    self.wfile.write(buf)

            def do_GET(self):
                self.send_response(405)
                self.end_headers()

            def log_message(self, *a):  # quiet test output
                pass

        self._server = ThreadingHTTPServer((host, int(port)), Handler)
        self.address = "%s:%d" % self._server.server_address[:2]
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

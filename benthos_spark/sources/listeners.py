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

import os
import socketserver
import threading
import uuid
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.sources.readers import Source


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
    404/405 otherwise). Same spool → file-stream consumption."""

    address: str = "127.0.0.1:0"
    path: str = "/post"
    spool_dir: str = ""
    max_buffer: int = 1 << 20
    streaming: bool = True
    _server: object = field(default=None, repr=False)

    def __post_init__(self):
        if not self.spool_dir:
            raise ValueError("http_server needs a spool_dir")

    def start(self) -> "HttpServerSource":
        host, port = self.address.rsplit(":", 1)
        spool, path, maxb = self.spool_dir, self.path, self.max_buffer

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                if self.path != path:
                    self.send_response(404)
                    self.end_headers()
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(min(n, maxb))
                # one message per request; strip a single trailing
                # newline so the text-stream row equals the body
                _spool_write(spool, body.rstrip(b"\n") + b"\n")
                self.send_response(200)
                self.end_headers()

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

"""`sync_response` + `http_server` outputs — the reply half of the io
request/response surface.

The reference's `sync_response` output (pure/output_sync_response.go:18)
stores the processed batch in the transaction's ResultStore so the
originating `http_server` input replies with it; its `http_server`
output (io/output_http_server.go:204) binds a server that clients pull
messages FROM (GET one message, GET a chunked stream, or a websocket).

Spark analogs, same split as sources/listeners.py: message PROCESSING
stays distributed (the correlation id / payload rides ordinary columns
through any shuffle); only the connection endpoint is driver-side,
because a bound port and an open reply socket are one-process objects
by nature. Both sinks are therefore connection-scale by contract —
`SyncResponseSink` guards that contract with a row bound (like
CacheWriteSink), and `HttpServerSink`'s bounded queue exerts the same
backpressure as the reference's unread transaction channel
(output_http_server.go:443 blocks until a client consumes).
"""

from __future__ import annotations

import threading
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from pyspark.sql import DataFrame

from benthos_spark.sources.listeners import (
    SYNC_META_KEY,
    SYNC_STORE,
    SyncResponseStore,
)


def _as_bytes(v) -> bytes:
    if v is None:
        return b""
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return str(v).encode("utf-8")


class SyncResponseSink:
    """`sync_response` output (pure/output_sync_response.go:18): post
    each message back to the `http_server` request that originated it,
    keyed by ``_meta[http_server_request_id]``. Rows without the key —
    messages from inputs that don't support sync responses — are
    dropped without penalty (the reference's documented contract), so
    this sink is safe inside a fan_out broker next to real outputs.

    Multiple rows carrying the same request id within a micro-batch
    become a multipart reply (input_http_server.go:612's encoding).
    ``max_rows`` guards the connection-scale contract: replies answer
    open HTTP requests, so a data-plane-sized batch here means the
    pipeline is misconfigured — refuse loudly rather than melt the
    driver. Rows stream through ``toLocalIterator``; nothing collects.
    """

    def __init__(self, store: SyncResponseStore | None = None,
                 col: str = "value", status: int = 200,
                 max_rows: Optional[int] = 10_000):
        self.store = store if store is not None else SYNC_STORE
        self.col = col
        self.status = status
        self.max_rows = max_rows

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        cols = [c for c in (self.col, "_meta") if c in df.columns]
        if self.col not in cols or "_meta" not in cols:
            return  # no payload or no correlation metadata: nothing to reply to
        by_req: dict[str, list[bytes]] = {}
        seen = 0
        for row in df.select(*cols).toLocalIterator():
            seen += 1
            if self.max_rows is not None and seen > self.max_rows:
                raise RuntimeError(
                    f"sync_response: batch exceeds {self.max_rows} rows — "
                    "replies are connection-scale; route the data plane to a "
                    "table sink and keep sync_response for the reply payload "
                    "(max_rows=None opts out)")
            meta = row["_meta"] or {}
            req_id = meta.get(SYNC_META_KEY)
            if not req_id:
                continue
            by_req.setdefault(req_id, []).append(_as_bytes(row[self.col]))
        for req_id, parts in by_req.items():
            self.store.set_result(req_id, parts, status=self.status)


class HttpServerSink:
    """`http_server` output (io/output_http_server.go:204): serve the
    pipeline's messages over HTTP for clients to pull. Endpoints mirror
    the reference: GET ``path`` returns exactly one message
    (application/octet-stream; 408 "Timed out waiting for message"
    after ``timeout_s`` with nothing to serve, 405 on a non-allowed
    verb — getHandler, output_http_server.go:281); GET ``stream_path``
    returns a chunked newline-delimited stream until the client
    disconnects (streamHandler, :340); GET ``ws_path`` upgrades to a
    websocket (RFC 6455, our from-scratch functions/ws.py) and pushes
    each message as one text frame (wsHandler, :391).

    The sink enqueues each row as one message. The queue is bounded
    (``max_queue``): when clients stop pulling, ``__call__`` BLOCKS the
    micro-batch — the same backpressure as the reference's unread
    transaction channel — and raises after ``put_timeout_s`` so an
    abandoned endpoint fails the query instead of hanging it forever.
    Driver-side singleton by nature (one bound port), like StdoutSink.
    """

    def __init__(self, address: str = "127.0.0.1:0", path: str = "/get",
                 stream_path: str = "/get/stream", ws_path: str = "/get/ws",
                 col: str = "value", timeout_s: float = 5.0,
                 max_queue: int = 1024, put_timeout_s: float = 300.0):
        self.path, self.stream_path, self.ws_path = path, stream_path, ws_path
        self.col = col
        self.timeout_s = timeout_s
        self.max_queue = max_queue
        self.put_timeout_s = put_timeout_s
        self._q: deque[bytes] = deque()
        self._lock = threading.Lock()
        self._not_empty = threading.Condition(self._lock)
        self._not_full = threading.Condition(self._lock)
        self._server = None
        self.address = address

    # -- queue (deque + two conditions: pop-one vs drain need peek) ------
    def _put(self, item: bytes) -> None:
        with self._not_full:
            if len(self._q) >= self.max_queue:
                if not self._not_full.wait_for(
                        lambda: len(self._q) < self.max_queue,
                        timeout=self.put_timeout_s):
                    raise RuntimeError(
                        f"http_server output: no client consumed for "
                        f"{self.put_timeout_s}s with {self.max_queue} messages "
                        "queued — the endpoint is unread")
            self._q.append(item)
            self._not_empty.notify()

    def _pop(self, timeout_s: float) -> Optional[bytes]:
        with self._not_empty:
            if not self._not_empty.wait_for(lambda: self._q, timeout=timeout_s):
                return None
            item = self._q.popleft()
            self._not_full.notify()
            return item

    # -- sink --------------------------------------------------------------
    def __call__(self, df: DataFrame, batch_id: int) -> None:
        if self._server is None:
            self.start()
        for row in df.select(self.col).toLocalIterator():
            self._put(_as_bytes(row[self.col]))

    # -- server ------------------------------------------------------------
    def start(self) -> "HttpServerSink":
        host, port = self.address.rsplit(":", 1)
        sink = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def do_GET(self):
                if self.path == sink.path:
                    msg = sink._pop(sink.timeout_s)
                    if msg is None:
                        self.send_response(408)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "application/octet-stream")
                    self.send_header("Content-Length", str(len(msg)))
                    self.end_headers()
                    self.wfile.write(msg)
                    return
                if self.path == sink.stream_path:
                    self.send_response(200)
                    self.send_header("Content-Type", "application/octet-stream")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                    try:
                        while True:
                            msg = sink._pop(sink.timeout_s)
                            if msg is None:
                                break  # idle: end the stream cleanly
                            chunk = msg + b"\n"
                            self.wfile.write(
                                f"{len(chunk):x}\r\n".encode() + chunk + b"\r\n")
                            self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        return  # client went away; stop serving this stream
                    self.wfile.write(b"0\r\n\r\n")
                    return
                if self.path == sink.ws_path and \
                        self.headers.get("Upgrade", "").lower() == "websocket":
                    from benthos_spark.functions import ws as W

                    key = self.headers.get("Sec-WebSocket-Key", "")
                    self.wfile.write(
                        ("HTTP/1.1 101 Switching Protocols\r\n"
                         "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                         f"Sec-WebSocket-Accept: {W.accept_key(key)}\r\n\r\n")
                        .encode())
                    self.wfile.flush()
                    try:
                        while True:
                            msg = sink._pop(sink.timeout_s)
                            if msg is None:
                                self.wfile.write(W.encode_frame(b"", opcode=W.OP_CLOSE))
                                break
                            self.wfile.write(W.encode_frame(msg, opcode=W.OP_TEXT))
                            self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                    self.close_connection = True
                    return
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_POST(self):
                self.send_response(405)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def log_message(self, *a):
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

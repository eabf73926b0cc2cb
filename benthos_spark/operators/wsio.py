"""`websocket` input/output over the from-scratch RFC 6455 client
(functions/ws.py).

Reference parity: the input connects to a websocket server and
receives messages, optionally sending an ``open_message`` on connect
(internal/impl/io/input_websocket.go:58); the output sends each
message over one connection (output_websocket.go:39). Spark shape:
the input is a bounded driver-side read (``max_messages`` /
``idle_timeout_s`` bound it — a batch read cannot hold a socket open
forever; the rows then distribute normally), the output opens one
connection per partition (executors cannot share a socket fd)."""

from __future__ import annotations

import socket
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.ws import OP_BINARY, OP_TEXT, WsClient
from benthos_spark.sources.readers import Source


@dataclass
class WebsocketSource(Source):
    """Bounded websocket client read: connect, optionally send
    ``open_message``, collect data messages until the server closes,
    ``max_messages`` arrive, or the socket idles ``idle_timeout_s``."""

    url: str = ""
    open_message: Optional[str] = None
    open_message_type: str = "text"
    max_messages: Optional[int] = None
    idle_timeout_s: float = 10.0
    streaming: bool = False

    def __post_init__(self):
        if not self.url:
            raise ValueError("websocket input needs a url")
        if self.open_message_type not in ("text", "binary"):
            raise ValueError(f"open_message_type {self.open_message_type!r} not recognised")

    def read(self, spark: SparkSession) -> DataFrame:
        c = WsClient(self.url, timeout_s=self.idle_timeout_s).connect()
        rows = []
        try:
            if self.open_message is not None:
                c.send(
                    self.open_message.encode()
                    if self.open_message_type == "binary"
                    else self.open_message
                )
            while self.max_messages is None or len(rows) < self.max_messages:
                try:
                    msg = c.recv()
                except (socket.timeout, TimeoutError, ConnectionError):
                    break
                if msg is None:
                    break
                _, payload = msg
                rows.append((payload.decode("utf-8", "replace"),))
        finally:
            c.close()
        return spark.createDataFrame(rows or [(None,)], "value string").filter(
            "value is not null"
        )


@dataclass
class WebsocketSink:
    """Send each message as one websocket frame (text for strings,
    binary for bytes) — one connection per partition; a send failure
    fails the batch so the runner retries (at-least-once)."""

    url: str = ""
    col: str = "value"
    timeout_s: float = 30.0

    def __post_init__(self):
        if not self.url:
            raise ValueError("websocket output needs a url")

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        url, col, timeout_s = self.url, self.col, self.timeout_s

        def send_partition(rows):
            c = None
            try:
                for row in rows:
                    if c is None:
                        c = WsClient(url, timeout_s=timeout_s).connect()
                    v = row[col]
                    if isinstance(v, (bytes, bytearray)):
                        c.send(bytes(v), opcode=OP_BINARY)
                    else:
                        c.send(str(v))
            finally:
                if c is not None:
                    c.close()

        df.select(col).foreachPartition(send_partition)

"""`zmq4` and `nanomsg` inputs/outputs
(internal/impl/zeromq/input_zmq4.go, output_zmq4.go,
internal/impl/nanomsg/input.go, output.go) over the from-scratch ZMTP
3.0 / SP wire codecs in benthos_spark/functions/zmtp.py.

Spark shapes (the socket_server/socket pattern — these are push-style
transports, not replayable logs):

- **inputs** (PULL or SUB, ``bind`` true by default like the
  reference's input): a driver-side listener (or connecting peer for
  ``bind: false``) spools messages to atomic files consumed as a
  checkpointed text stream; batch mode drains until idle. At-least-once
  from the spool rename onward — ZMTP/SP themselves offer no acking, so
  delivery before the spool is the transports' own fire-and-forget
  contract (exactly the reference's).
- **outputs** (PUSH or PUB, ``bind`` false by default like the
  reference's output): one connection per Spark partition from
  executors; PUB subscribers filter by ZMTP prefix subscription
  server-side, by SP convention client-side."""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions import zmtp as Z
from benthos_spark.sources.readers import Source


def _spool_lines(spool_dir: str, payloads: list[bytes]) -> None:
    from benthos_spark.sources.listeners import _spool_write

    _spool_write(spool_dir, b"".join(p.replace(b"\n", b" ") + b"\n"
                                     for p in payloads))


@dataclass
class ZmqSource(Source):
    """`zmq4` input: socket_type PULL|SUB."""

    urls: list[str] = field(default_factory=list)
    socket_type: str = "PULL"
    bind: bool = True
    sub_filters: list[str] = field(default_factory=lambda: [""])
    spool_dir: str = ""
    streaming: bool = False
    idle_timeout_s: float = 1.0
    _listener: object = field(default=None, repr=False)
    _threads: list = field(default_factory=list, repr=False)
    _stop: object = field(default=None, repr=False)

    def __post_init__(self):
        if self.socket_type not in ("PULL", "SUB"):
            raise ValueError(f"zmq4 input socket_type {self.socket_type!r} "
                             "(want PULL or SUB)")
        if not self.spool_dir:
            raise ValueError("zmq4 input needs a spool_dir")

    def start(self) -> "ZmqSource":
        os.makedirs(self.spool_dir, exist_ok=True)
        spool = self.spool_dir

        def on_message(parts: list[bytes]) -> None:
            _spool_lines(spool, [b"".join(parts)])

        if self.bind:
            listeners = []
            bound = []
            for url in self.urls:
                lst = Z.ZmtpListener(url, self.socket_type, on_message)
                listeners.append(lst)
                bound.append(f"tcp://{lst.address}")
            self._listener = listeners
            self.urls = bound
        else:
            stop = threading.Event()
            self._stop = stop
            for url in self.urls:
                def loop(u=url):
                    conn = Z.zmtp_connect(u, self.socket_type)
                    if self.socket_type == "SUB":
                        for f in self.sub_filters:
                            conn.subscribe(f.encode())
                    try:
                        while not stop.is_set():
                            on_message(conn.recv_message())
                    except (ConnectionError, OSError):
                        pass

                t = threading.Thread(target=loop, daemon=True)
                t.start()
                self._threads.append(t)
        return self

    def peer_count(self) -> int:
        return sum(l.peer_count() for l in (self._listener or []))

    def read(self, spark: SparkSession) -> DataFrame:
        if self._listener is None and not self._threads:
            self.start()
        if self.streaming:
            return (spark.readStream.format("text")
                    .schema("value string").load(self.spool_dir))
        deadline = time.monotonic() + self.idle_timeout_s
        while time.monotonic() < deadline:
            time.sleep(0.05)
        return spark.read.schema("value string").text(self.spool_dir)

    def stop(self) -> None:
        if self._stop is not None:
            self._stop.set()
        for l in (self._listener or []):
            l.close()


class ZmqSink:
    """`zmq4` output: socket_type PUSH|PUB, connecting by default."""

    def __init__(self, urls: list[str], socket_type: str = "PUSH",
                 bind: bool = False, col: str = "value"):
        if socket_type not in ("PUSH", "PUB"):
            raise ValueError(f"zmq4 output socket_type {socket_type!r} "
                             "(want PUSH or PUB)")
        self.urls, self.socket_type, self.bind, self.col = urls, socket_type, bind, col
        self._listener = None
        if bind:
            self._listener = [Z.ZmtpListener(u, socket_type) for u in urls]
            self.urls = [f"tcp://{l.address}" for l in self._listener]

    def peer_count(self) -> int:
        return sum(l.peer_count() for l in (self._listener or []))

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        col, st = self.col, self.socket_type
        if self._listener is not None:
            # bound output: fan out driver-side through the listener
            listeners = self._listener
            for row in df.select(col).toLocalIterator():
                v = row[col]
                data = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                for l in listeners:
                    (l.publish if st == "PUB" else l.push)([data])
            return
        urls = self.urls

        def write_partition(rows):
            conns = [Z.zmtp_connect(u, st) for u in urls]
            try:
                i = 0
                for row in rows:
                    v = row[col]
                    data = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    if st == "PUB":
                        for c in conns:
                            c.send_message([data])
                    else:
                        conns[i % len(conns)].send_message([data])
                        i += 1
            finally:
                for c in conns:
                    c.close()

        df.select(col).foreachPartition(write_partition)


@dataclass
class NanomsgSource(Source):
    """`nanomsg` input: socket_type PULL|SUB; SP SUB filtering is
    client-side per the protocol."""

    urls: list[str] = field(default_factory=list)
    socket_type: str = "PULL"
    bind: bool = True
    sub_filters: list[str] = field(default_factory=lambda: [""])
    spool_dir: str = ""
    streaming: bool = False
    idle_timeout_s: float = 1.0
    _listener: object = field(default=None, repr=False)
    _threads: list = field(default_factory=list, repr=False)
    _stop: object = field(default=None, repr=False)

    def __post_init__(self):
        if self.socket_type not in ("PULL", "SUB"):
            raise ValueError(f"nanomsg input socket_type {self.socket_type!r}")
        if not self.spool_dir:
            raise ValueError("nanomsg input needs a spool_dir")

    def start(self) -> "NanomsgSource":
        os.makedirs(self.spool_dir, exist_ok=True)
        spool, filters = self.spool_dir, [f.encode() for f in self.sub_filters]
        is_sub = self.socket_type == "SUB"

        def on_message(payload: bytes) -> None:
            if is_sub and not any(payload.startswith(f) for f in filters):
                return  # nanomsg SUB filtering is receiver-side
            _spool_lines(spool, [payload])

        if self.bind:
            listeners = []
            bound = []
            for url in self.urls:
                lst = Z.SpListener(url, self.socket_type, on_message)
                listeners.append(lst)
                bound.append(f"tcp://{lst.address}")
            self._listener = listeners
            self.urls = bound
        else:
            stop = threading.Event()
            self._stop = stop
            for url in self.urls:
                def loop(u=url):
                    conn = Z.sp_connect(u, self.socket_type)
                    try:
                        while not stop.is_set():
                            on_message(conn.recv())
                    except (ConnectionError, OSError):
                        pass

                t = threading.Thread(target=loop, daemon=True)
                t.start()
                self._threads.append(t)
        return self

    def peer_count(self) -> int:
        return sum(l.peer_count() for l in (self._listener or []))

    def read(self, spark: SparkSession) -> DataFrame:
        if self._listener is None and not self._threads:
            self.start()
        if self.streaming:
            return (spark.readStream.format("text")
                    .schema("value string").load(self.spool_dir))
        deadline = time.monotonic() + self.idle_timeout_s
        while time.monotonic() < deadline:
            time.sleep(0.05)
        return spark.read.schema("value string").text(self.spool_dir)

    def stop(self) -> None:
        if self._stop is not None:
            self._stop.set()
        for l in (self._listener or []):
            l.close()


class NanomsgSink:
    """`nanomsg` output: socket_type PUSH|PUB, connecting by default."""

    def __init__(self, urls: list[str], socket_type: str = "PUSH",
                 bind: bool = False, col: str = "value"):
        if socket_type not in ("PUSH", "PUB"):
            raise ValueError(f"nanomsg output socket_type {socket_type!r}")
        self.urls, self.socket_type, self.bind, self.col = urls, socket_type, bind, col
        self._listener = None
        if bind:
            self._listener = [Z.SpListener(u, socket_type) for u in urls]
            self.urls = [f"tcp://{l.address}" for l in self._listener]

    def peer_count(self) -> int:
        return sum(l.peer_count() for l in (self._listener or []))

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        col, st = self.col, self.socket_type
        if self._listener is not None:
            listeners = self._listener
            for row in df.select(col).toLocalIterator():
                v = row[col]
                data = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                for l in listeners:
                    (l.publish if st == "PUB" else l.push)(data)
            return
        urls = self.urls

        def write_partition(rows):
            conns = [Z.sp_connect(u, st) for u in urls]
            try:
                i = 0
                for row in rows:
                    v = row[col]
                    data = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    if st == "PUB":
                        for c in conns:
                            c.send(data)
                    else:
                        conns[i % len(conns)].send(data)
                        i += 1
            finally:
                for c in conns:
                    c.close()

        df.select(col).foreachPartition(write_partition)

"""`nsq` and `beanstalkd` inputs/outputs (internal/impl/nsq/input.go,
output.go; internal/impl/beanstalkd/input.go, output.go) over the
from-scratch protocol stacks in benthos_spark/functions/queue_protos.

Both are destructive queue protocols: the streaming inputs follow the
consumer→spool→file-stream ingress (one driver consumer — the protocol
delivers to a connection; the CONSUMPTION scales with partitions), and
nsq FINs / beanstalkd deletes only after the spool rename, so a crash
in between redelivers (at-least-once). Batch modes drain to empty.
Outputs publish per Spark partition."""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.queue_protos import (BeanstalkdConnection,
                                                  NsqConnection)
from benthos_spark.sources.readers import Source


@dataclass
class NsqSource(Source):
    """`nsq` input: SUB <topic> <channel>; each message is one row."""

    address: str = ""
    topic: str = ""
    channel: str = "benthos_spark"
    spool_dir: str = ""
    streaming: bool = True
    _conn: object = field(default=None, repr=False)

    def __post_init__(self):
        if not self.streaming:
            raise ValueError("nsq is push-delivery; use streaming mode")
        if not self.spool_dir:
            raise ValueError("nsq input needs a spool_dir")

    def start(self) -> "NsqSource":
        from benthos_spark.sources.listeners import _spool_write

        os.makedirs(self.spool_dir, exist_ok=True)
        spool = self.spool_dir
        conn = NsqConnection(self.address)
        conn.sub(self.topic, self.channel,
                 lambda body: _spool_write(spool, body.rstrip(b"\n") + b"\n"))
        self._conn = conn
        return self

    def read(self, spark: SparkSession) -> DataFrame:
        if self._conn is None:
            self.start()
        return spark.readStream.format("text").load(self.spool_dir)

    def stop(self) -> None:
        if self._conn is not None:
            self._conn.close()
            self._conn = None


class NsqSink:
    """`nsq` output: PUB each row to ``topic`` (OK-confirmed per
    message, go-nsq's synchronous shape); one connection per partition."""

    def __init__(self, address: str, topic: str, col: str = "value"):
        self.address, self.topic, self.col = address, topic, col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        address, topic, col = self.address, self.topic, self.col

        def write_partition(rows):
            conn = None
            try:
                for row in rows:
                    if conn is None:
                        conn = NsqConnection(address)
                    v = row[col]
                    conn.pub(topic, bytes(v) if isinstance(v, (bytes, bytearray))
                             else str(v).encode())
            finally:
                if conn is not None:
                    conn.close()

        df.select(col).foreachPartition(write_partition)


@dataclass
class BeanstalkdSource(Source):
    """`beanstalkd` input: reserve jobs off a tube; delete after spool
    (streaming) or after collection into the batch frame."""

    address: str = ""
    tube: str = "default"
    spool_dir: str = ""
    streaming: bool = False
    poll_timeout_s: int = 1
    _thread: object = field(default=None, repr=False)
    _stop: object = field(default=None, repr=False)

    def read(self, spark: SparkSession) -> DataFrame:
        if not self.streaming:
            conn = BeanstalkdConnection(self.address)
            try:
                conn.watch(self.tube)
                rows = []
                while True:
                    got = conn.reserve(timeout_s=0)
                    if got is None:
                        break
                    jid, body = got
                    rows.append((body.decode("utf-8", "replace"),))
                    conn.delete(jid)
                return spark.createDataFrame(rows, "value string")
            finally:
                conn.close()
        if not self.spool_dir:
            raise ValueError("streaming beanstalkd input needs a spool_dir")
        from benthos_spark.sources.listeners import _spool_write

        os.makedirs(self.spool_dir, exist_ok=True)
        if self._thread is None:
            stop = threading.Event()
            address, tube, spool, tmo = (self.address, self.tube,
                                         self.spool_dir, self.poll_timeout_s)

            def loop():
                conn = BeanstalkdConnection(address)
                conn.watch(tube)
                while not stop.is_set():
                    try:
                        got = conn.reserve(timeout_s=tmo)
                    except (IOError, OSError, ConnectionError):
                        time.sleep(0.2)
                        conn = BeanstalkdConnection(address)
                        conn.watch(tube)
                        continue
                    if got is not None:
                        jid, body = got
                        _spool_write(spool, body.rstrip(b"\n") + b"\n")
                        conn.delete(jid)  # delete AFTER the durable rename
                conn.close()

            self._stop = stop
            self._thread = threading.Thread(target=loop, daemon=True)
            self._thread.start()
        return spark.readStream.format("text").load(self.spool_dir)

    def stop(self) -> None:
        if self._stop is not None:
            self._stop.set()
            self._thread = None


class BeanstalkdSink:
    """`beanstalkd` output: put each row onto ``tube``."""

    def __init__(self, address: str, tube: str = "default", col: str = "value"):
        self.address, self.tube, self.col = address, tube, col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        address, tube, col = self.address, self.tube, self.col

        def write_partition(rows):
            conn = None
            try:
                for row in rows:
                    if conn is None:
                        conn = BeanstalkdConnection(address)
                        conn.use(tube)
                    v = row[col]
                    conn.put(bytes(v) if isinstance(v, (bytes, bytearray))
                             else str(v).encode())
            finally:
                if conn is not None:
                    conn.close()

        df.select(col).foreachPartition(write_partition)

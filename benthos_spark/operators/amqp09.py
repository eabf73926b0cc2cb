"""`amqp_0_9` input/output (internal/impl/amqp09/input.go, output.go)
over the from-scratch AMQP 0-9-1 stack in
benthos_spark/functions/amqp_proto.py.

Input: consumes a queue with explicit acks — the consumer runs on the
driver (AMQP push delivery to one channel) and spools atomic files
consumed as a checkpointed text stream (listener→spool→file-stream, the
repo's standard push-protocol ingress); a message is acked only AFTER
its spool file is durably renamed, so a crash between delivery and
spool re-delivers (at-least-once, upgraded downstream by the ledger
sink). Optional queue declare + bindings mirror the reference's
queue_declare/bindings_declare blocks. Batch mode drains via basic.get.

Output: publishes per Spark partition to an exchange with a fixed or
per-row routing key (the reference's interpolated key)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.amqp_proto import AmqpConnection
from benthos_spark.sources.readers import Source


@dataclass
class Amqp09Source(Source):
    url: str = ""
    queue: str = ""
    declare: bool = False
    bindings: Sequence[tuple[str, str]] = ()  # (exchange, routing_key)
    spool_dir: str = ""
    streaming: bool = True
    _conn: object = field(default=None, repr=False)

    def _setup(self, conn: AmqpConnection) -> None:
        if self.declare:
            conn.queue_declare(self.queue)
            for exchange, key in self.bindings:
                conn.queue_bind(self.queue, exchange, key)

    def read(self, spark: SparkSession) -> DataFrame:
        if not self.streaming:
            conn = AmqpConnection(self.url)
            try:
                self._setup(conn)
                rows = []
                while True:
                    body = conn.get(self.queue)
                    if body is None:
                        break
                    rows.append((body.decode("utf-8", "replace"),))
                return spark.createDataFrame(rows, "value string")
            finally:
                conn.close()
        if not self.spool_dir:
            raise ValueError("streaming amqp_0_9 input needs a spool_dir")
        from benthos_spark.sources.listeners import _spool_write

        os.makedirs(self.spool_dir, exist_ok=True)
        if self._conn is None:
            conn = AmqpConnection(self.url)
            self._setup(conn)
            spool = self.spool_dir
            conn.consume(self.queue,
                         lambda body, rk: _spool_write(spool, body.rstrip(b"\n") + b"\n"))
            self._conn = conn
        return spark.readStream.format("text").load(self.spool_dir)

    def stop(self) -> None:
        if self._conn is not None:
            self._conn.close()
            self._conn = None


class Amqp09Sink:
    """Publish each row to ``exchange`` with ``key`` (or per-row
    ``key_col``); one connection per Spark partition."""

    def __init__(self, url: str, exchange: str = "", key: str = "",
                 col: str = "value", key_col: Optional[str] = None,
                 declare_queue: Optional[str] = None):
        self.url, self.exchange, self.key = url, exchange, key
        self.col, self.key_col = col, key_col
        self.declare_queue = declare_queue

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        url, exchange, key, col, key_col = (self.url, self.exchange, self.key,
                                            self.col, self.key_col)
        declare_queue = self.declare_queue
        cols = [col] + ([key_col] if key_col else [])

        def write_partition(rows):
            conn = None
            try:
                for row in rows:
                    if conn is None:
                        conn = AmqpConnection(url)
                        if declare_queue:
                            conn.queue_declare(declare_queue)
                    v = row[col]
                    body = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    conn.publish(exchange, row[key_col] if key_col else key, body)
                if conn is not None:
                    # publish is async in 0-9-1; a queue.declare RPC
                    # round-trips the channel, guaranteeing the broker
                    # processed every prior frame before we hang up
                    conn.queue_declare(declare_queue or "__flush__")
            finally:
                if conn is not None:
                    conn.close()

        df.select(*cols).foreachPartition(write_partition)

"""`pulsar` input/output (internal/impl/pulsar/input.go:22,
output.go:24) over the from-scratch binary-protocol client in
benthos_spark/functions/pulsar_proto.py.

Spark shapes:

- **input**: the reference's consumer is SUBSCRIBE + FLOW + per-message
  ACK — a queue consumer, not an offset reader — so the same contract
  as the other ack-based inputs: batch mode drains with an idle
  timeout, acking each message after it is collected; streaming mode
  runs a driver consume loop spooling atomic files and ACKS ONLY AFTER
  the durable spool rename (crash in between → broker redelivery of
  unacked messages: at-least-once, upgraded to exactly-once by the
  sink ledger downstream). ``subscription_type`` shared|exclusive and
  ``subscription_initial_position`` earliest|latest mirror the
  reference's fields.
- **output**: one producer per Spark partition; every SEND waits for
  its receipt (the reference's synchronous-by-default publish), with
  ``key_col`` as the partition-key interpolation analog."""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.pulsar_proto import PulsarClient
from benthos_spark.sources.readers import Source

_SUB_TYPES = {"exclusive": 0, "shared": 1}
_POSITIONS = {"latest": 0, "earliest": 1}


@dataclass
class PulsarSource(Source):
    """`pulsar` input: subscription consumer with ack-after-spool."""

    url: str = ""
    topic: str = ""
    subscription_name: str = ""
    subscription_type: str = "shared"
    subscription_initial_position: str = "earliest"
    spool_dir: str = ""
    streaming: bool = False
    idle_timeout_s: float = 1.0
    _thread: object = field(default=None, repr=False)
    _stop: object = field(default=None, repr=False)

    def __post_init__(self):
        if self.subscription_type not in _SUB_TYPES:
            raise ValueError(f"subscription_type {self.subscription_type!r}")
        if self.subscription_initial_position not in _POSITIONS:
            raise ValueError(
                f"subscription_initial_position {self.subscription_initial_position!r}")

    def _consumer(self) -> PulsarClient:
        c = PulsarClient(self.url)
        c.subscribe(self.topic, self.subscription_name,
                    sub_type=_SUB_TYPES[self.subscription_type],
                    initial_position=_POSITIONS[self.subscription_initial_position])
        c.flow(1000)
        return c

    def read(self, spark: SparkSession) -> DataFrame:
        if not self.streaming:
            c = self._consumer()
            rows = []
            try:
                while True:
                    msg = c.receive(timeout_s=self.idle_timeout_s)
                    if msg is None:
                        break
                    rows.append((msg["payload"].decode("utf-8", "replace"),
                                 msg["partition_key"]))
                    c.ack(msg["message_id"])
                    if len(rows) % 500 == 0:
                        c.flow(1000)
            finally:
                c.close()
            return spark.createDataFrame(rows, "value string, key string")
        if not self.spool_dir:
            raise ValueError("streaming pulsar input needs a spool_dir")
        from benthos_spark.sources.listeners import _spool_write

        os.makedirs(self.spool_dir, exist_ok=True)
        if self._thread is None:
            stop = threading.Event()
            spool = self.spool_dir

            def loop():
                c = self._consumer()
                n = 0
                try:
                    while not stop.is_set():
                        msg = c.receive(timeout_s=0.2)
                        if msg is None:
                            continue
                        # durable spool FIRST, ack after (at-least-once)
                        _spool_write(spool, msg["payload"]
                                     .replace(b"\n", b" ") + b"\n")
                        c.ack(msg["message_id"])
                        n += 1
                        if n % 500 == 0:
                            c.flow(1000)
                finally:
                    c.close()

            self._stop = stop
            t = threading.Thread(target=loop, daemon=True)
            t.start()
            self._thread = t
        return (spark.readStream.format("text")
                .schema("value string").load(self.spool_dir))

    def stop(self) -> None:
        if self._stop is not None:
            self._stop.set()
            self._thread.join(timeout=5)


class PulsarSink:
    """`pulsar` output: producer per Spark partition, receipt-awaited
    sends."""

    def __init__(self, url: str, topic: str, col: str = "value",
                 key_col: Optional[str] = None):
        self.url, self.topic, self.col, self.key_col = url, topic, col, key_col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        url, topic, col, key_col = self.url, self.topic, self.col, self.key_col
        cols = [col] + ([key_col] if key_col else [])

        def write_partition(pid: int, rows):
            client = None
            try:
                for row in rows:
                    if client is None:
                        client = PulsarClient(url)
                        client.create_producer(topic, producer_id=pid + 1)
                    v = row[col]
                    data = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    client.send(data,
                                partition_key=(str(row[key_col]) if key_col else None))
            finally:
                if client is not None:
                    client.close()
            return iter(())

        df.select(*cols).rdd.mapPartitionsWithIndex(write_partition).count()

"""`amqp_1` input/output (internal/impl/amqp1/input.go, output.go)
over the from-scratch AMQP 1.0 codec in
benthos_spark/functions/amqp1_proto.py.

Spark shapes (the ack-based queue contract, like pulsar/sqs):

- **input**: a receiver link on ``source_address`` with link credit;
  batch mode drains with an idle timeout, ACCEPTING each delivery
  after collection; streaming mode runs a driver receive loop spooling
  atomic files and accepts ONLY AFTER the durable spool rename (crash
  in between → the broker requeues unsettled deliveries:
  at-least-once, upgraded to exactly-once by the sink ledger
  downstream — the reference input's same story).
- **output**: a sender link on ``target_address`` per Spark partition;
  every transfer waits for its accepted disposition (the reference
  publishes synchronously too)."""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.amqp1_proto import Amqp1Connection
from benthos_spark.sources.readers import Source


@dataclass
class Amqp1Source(Source):
    url: str = ""
    source_address: str = ""
    credit: int = 200
    spool_dir: str = ""
    streaming: bool = False
    idle_timeout_s: float = 1.0
    _thread: object = field(default=None, repr=False)
    _stop: object = field(default=None, repr=False)

    def _receiver(self) -> Amqp1Connection:
        c = Amqp1Connection(self.url)
        c.attach_receiver(self.source_address, credit=self.credit)
        return c

    def read(self, spark: SparkSession) -> DataFrame:
        if not self.streaming:
            c = self._receiver()
            rows = []
            try:
                while True:
                    msg = c.receive(timeout_s=self.idle_timeout_s)
                    if msg is None:
                        break
                    rows.append((msg["body"].decode("utf-8", "replace"),))
                    c.accept(msg["delivery_id"])
            finally:
                c.close()
            return spark.createDataFrame(rows, "value string")
        if not self.spool_dir:
            raise ValueError("streaming amqp_1 input needs a spool_dir")
        from benthos_spark.sources.listeners import _spool_write

        os.makedirs(self.spool_dir, exist_ok=True)
        if self._thread is None:
            stop = threading.Event()
            spool = self.spool_dir

            def loop():
                c = self._receiver()
                try:
                    while not stop.is_set():
                        msg = c.receive(timeout_s=0.2)
                        if msg is None:
                            continue
                        # durable spool FIRST, accept after
                        _spool_write(spool,
                                     msg["body"].replace(b"\n", b" ") + b"\n")
                        c.accept(msg["delivery_id"])
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


class Amqp1Sink:
    def __init__(self, url: str, target_address: str, col: str = "value"):
        self.url, self.target_address, self.col = url, target_address, col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        url, target, col = self.url, self.target_address, self.col

        def write_partition(rows):
            conn = None
            try:
                for row in rows:
                    if conn is None:
                        conn = Amqp1Connection(url)
                        conn.attach_sender(target)
                    v = row[col]
                    data = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    conn.send(data)
            finally:
                if conn is not None:
                    conn.close()

        df.select(col).foreachPartition(write_partition)

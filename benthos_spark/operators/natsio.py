"""`nats` input/output (internal/impl/nats/input.go, output.go) over
the from-scratch protocol client in benthos_spark/functions/nats_proto.

Spark shape: NATS core is fire-and-forget push delivery (no replay), so
the input follows the listener→spool→file-stream ingress pattern
(sources/listeners.py) — one driver subscriber (optionally in a QUEUE
GROUP, the reference's load-balancing field; multiple pipelines sharing
a group split the subject) spools atomic files consumed as a
checkpointed text stream. The output publishes per Spark partition with
one connection each, subject either fixed or per-row (the reference's
interpolated subject)."""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.nats_proto import NatsConnection
from benthos_spark.sources.readers import Source


@dataclass
class NatsSource(Source):
    """`nats` input: SUB a subject (wildcards allowed), each published
    message is one row. ``queue`` joins a queue group — the broker
    delivers each message to one group member."""

    url: str = ""
    subject: str = ""
    queue: Optional[str] = None
    spool_dir: str = ""
    streaming: bool = True
    _conn: object = field(default=None, repr=False)

    def __post_init__(self):
        if not self.streaming:
            raise ValueError("nats core is push-only; batch mode is not meaningful")
        if not self.spool_dir:
            raise ValueError("nats input needs a spool_dir")

    def start(self) -> "NatsSource":
        from benthos_spark.sources.listeners import _spool_write

        os.makedirs(self.spool_dir, exist_ok=True)
        spool = self.spool_dir
        conn = NatsConnection(self.url)

        def on_msg(subject: str, payload: bytes, reply):
            _spool_write(spool, payload.rstrip(b"\n") + b"\n")

        conn.subscribe(self.subject, on_msg, queue=self.queue)
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


class NatsSink:
    """`nats` output: PUB each row to ``subject`` (or a per-row
    ``subject_col``); one connection per Spark partition, PING-flushed
    before close so a fast batch can't race the socket teardown."""

    def __init__(self, url: str, subject: str = "", col: str = "value",
                 subject_col: Optional[str] = None):
        self.url, self.subject = url, subject
        self.col, self.subject_col = col, subject_col

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        url, subject, col, subj_col = self.url, self.subject, self.col, self.subject_col
        cols = [col] + ([subj_col] if subj_col else [])

        def write_partition(rows):
            conn = None
            try:
                for row in rows:
                    if conn is None:
                        conn = NatsConnection(url)
                    v = row[col]
                    payload = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    conn.publish(row[subj_col] if subj_col else subject, payload)
                if conn is not None:
                    conn.flush()
            finally:
                if conn is not None:
                    conn.close()

        df.select(*cols).foreachPartition(write_partition)

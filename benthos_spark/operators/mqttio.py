"""`mqtt` input/output (internal/impl/mqtt/input.go, output.go) over
the from-scratch MQTT 3.1.1 codec in benthos_spark/functions/mqtt_proto.

Same ingress shape as nats/pubsub: MQTT is push delivery (no replay for
non-persistent sessions), so the input runs one driver subscriber that
spools atomic files consumed as a checkpointed text stream; QoS 1
subscription means the broker redelivers unacked messages — combined
with the file-source checkpoint this yields the reference's
at-least-once contract. The output publishes per Spark partition at
QoS 1 (each publish waits for PUBACK, the paho-default shape)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions.mqtt_proto import MqttConnection
from benthos_spark.sources.readers import Source


@dataclass
class MqttSource(Source):
    """`mqtt` input: subscribe to a topic filter (`+`/`#` wildcards),
    each PUBLISH is one row."""

    url: str = ""
    topic: str = ""
    qos: int = 1
    client_id: str = "benthos-spark-in"
    spool_dir: str = ""
    streaming: bool = True
    _conn: object = field(default=None, repr=False)

    def __post_init__(self):
        if not self.streaming:
            raise ValueError("mqtt is push-only; batch mode is not meaningful")
        if not self.spool_dir:
            raise ValueError("mqtt input needs a spool_dir")

    def start(self) -> "MqttSource":
        from benthos_spark.sources.listeners import _spool_write

        os.makedirs(self.spool_dir, exist_ok=True)
        spool = self.spool_dir
        conn = MqttConnection(self.url, client_id=self.client_id)
        conn.subscribe(self.topic,
                       lambda topic, payload: _spool_write(spool, payload.rstrip(b"\n") + b"\n"),
                       qos=self.qos)
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


class MqttSink:
    """`mqtt` output: publish each row to ``topic`` (or per-row
    ``topic_col``) at QoS 1; one connection per Spark partition."""

    def __init__(self, url: str, topic: str = "", col: str = "value",
                 topic_col: Optional[str] = None, qos: int = 1,
                 retained: bool = False):
        self.url, self.topic, self.col = url, topic, col
        self.topic_col, self.qos, self.retained = topic_col, qos, retained

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        url, topic, col = self.url, self.topic, self.col
        topic_col, qos, retained = self.topic_col, self.qos, self.retained
        cols = [col] + ([topic_col] if topic_col else [])

        def write_partition(rows):
            conn = None
            try:
                for i, row in enumerate(rows):
                    if conn is None:
                        from pyspark import TaskContext

                        tc = TaskContext.get()
                        pid = tc.partitionId() if tc is not None else 0
                        conn = MqttConnection(url, client_id=f"benthos-spark-out-{pid}")
                    v = row[col]
                    payload = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    conn.publish(row[topic_col] if topic_col else topic,
                                 payload, qos=qos, retain=retained)
            finally:
                if conn is not None:
                    conn.close()

        df.select(*cols).foreachPartition(write_partition)

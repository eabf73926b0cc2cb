"""Kafka input/output — a from-scratch wire-protocol client surfaced as
a checkpoint-resumable Spark source and a per-partition producing sink.

Reference surface: internal/impl/kafka/input_kafka_franz.go (franz-go
consumer), output_kafka_franz.go (producer), and the sarama variants.
The reference delegates offset management to consumer groups; in Spark
the offset log IS the consumer group — this source checkpoints
``{topic-partition: next_offset}`` exactly like Spark's own Kafka
connector, so resume re-reads precisely the uncommitted span and the
exactly-once sink ledger upgrades delivery end to end. On a real
cluster users would typically use Spark's built-in
``readStream.format("kafka")`` (documented substitution in SURVEY §7);
this implementation removes even that dependency — executors speak the
public Kafka protocol (kafka.apache.org/protocol) directly via
benthos_spark/functions/kafka_proto.py, and tests run against the
loopback :class:`~benthos_spark.functions.kafka_proto.MiniKafkaBroker`.

Scale shape: one Spark input partition per Kafka topic-partition per
micro-batch (the native parallelism of the log); executors fetch their
own partition's span with bounded-size Fetch loops (Arrow-friendly
bytes columns); the sink produces per Spark partition with record
batches of ``batch_records`` messages. Keys ride a ``key`` binary
column — partitioning by key uses murmur2 (the Java client's default
partitioner) so co-keyed messages land in one partition like the
reference's producer.
"""

from __future__ import annotations

import socket
import struct
import threading
from dataclasses import dataclass
from typing import Any, Iterator, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from benthos_spark.functions import kafka_proto as KP
from benthos_spark.sources.readers import Source

KAFKA_SCHEMA = ("topic string, partition int, offset long, timestamp_ms long, "
                "key binary, value binary, headers map<string,binary>")


def murmur2(data: bytes) -> int:
    """Kafka's partitioner hash (org.apache.kafka.common.utils.Utils
    murmur2, seed 0x9747b28c) — public algorithm, needed for producer
    key-partition parity with the Java/franz clients."""
    length = len(data)
    seed = 0x9747B28C
    m = 0x5BD1E995
    h = (seed ^ length) & 0xFFFFFFFF
    i = 0
    while length - i >= 4:
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> 24
        k = (k * m) & 0xFFFFFFFF
        h = ((h * m) & 0xFFFFFFFF) ^ k
        i += 4
    rest = length - i
    if rest >= 3:
        h ^= data[i + 2] << 16
    if rest >= 2:
        h ^= data[i + 1] << 8
    if rest >= 1:
        h ^= data[i]
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def partition_for_key(key: Optional[bytes], n_partitions: int, counter: int = 0) -> int:
    """keyed → murmur2(key) & 0x7fffffff % n (Java default partitioner);
    unkeyed → round-robin on the caller's counter."""
    if key is None:
        return counter % n_partitions
    return (murmur2(key) & 0x7FFFFFFF) % n_partitions


class KafkaWireClient:
    """One broker connection: framed request/response with correlation
    ids. Synchronous (the connectors issue one in-flight request per
    task, matching acks=all ordering)."""

    def __init__(self, address: str, client_id: str = "benthos-spark",
                 timeout_s: float = 30.0):
        host, port = address.rsplit(":", 1)
        self.host, self.port = host, int(port)
        self.client_id = client_id
        self._timeout = timeout_s
        self._sock: Optional[socket.socket] = None
        self._corr = 0
        self._lock = threading.Lock()

    def _connect(self):
        if self._sock is None:
            self._sock = socket.create_connection((self.host, self.port),
                                                  timeout=self._timeout)

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("broker closed connection")
            buf += chunk
        return buf

    def _call(self, api_key: int, api_version: int, body: bytes) -> KP.Reader:
        with self._lock:
            self._connect()
            self._corr += 1
            corr = self._corr
            self._sock.sendall(KP.encode_request(api_key, api_version, corr,
                                                 self.client_id, body))
            size = struct.unpack(">i", self._read_exact(4))[0]
            frame = self._read_exact(size)
            r = KP.Reader(frame)
            got_corr = r.i32()
            if got_corr != corr:
                raise ValueError(f"correlation mismatch {got_corr} != {corr}")
            return r

    def api_versions(self) -> dict[int, tuple[int, int]]:
        return KP.decode_api_versions_response(
            self._call(KP.API_VERSIONS, 0, b""))

    def metadata(self, topics: Optional[list[str]] = None) -> dict:
        return KP.decode_metadata_response(
            self._call(KP.API_METADATA, 1, KP.encode_metadata_request(topics)))

    def produce(self, topic_parts: dict[str, dict[int, bytes]],
                acks: int = -1) -> dict:
        out = KP.decode_produce_response(
            self._call(KP.API_PRODUCE, 3,
                       KP.encode_produce_request(topic_parts, acks=acks)))
        for topic, parts in out.items():
            for pid, (err, _base) in parts.items():
                if err:
                    raise IOError(f"produce {topic}[{pid}] failed: kafka error {err}")
        return out

    def fetch(self, topic_parts: dict[str, dict[int, int]],
              max_wait_ms: int = 500, min_bytes: int = 1) -> dict:
        return KP.decode_fetch_response(
            self._call(KP.API_FETCH, 4,
                       KP.encode_fetch_request(topic_parts, max_wait_ms=max_wait_ms,
                                               min_bytes=min_bytes)))

    def list_offsets(self, topic_parts: dict[str, dict[int, int]]) -> dict:
        out = KP.decode_list_offsets_response(
            self._call(KP.API_LIST_OFFSETS, 1,
                       KP.encode_list_offsets_request(topic_parts)))
        for topic, parts in out.items():
            for pid, (err, _off) in parts.items():
                if err:
                    raise IOError(f"list_offsets {topic}[{pid}]: kafka error {err}")
        return out

    def close(self):
        with self._lock:
            if self._sock is not None:
                try:
                    self._sock.close()
                finally:
                    self._sock = None


def fetch_span(address: str, topic: str, partition: int,
               start: int, end: int) -> Iterator[tuple]:
    """All records with start <= offset < end, as source rows. Loops
    bounded Fetch requests (the broker may truncate at max_bytes)."""
    client = KafkaWireClient(address)
    try:
        off = start
        empty_streak = 0
        while off < end:
            resp = client.fetch({topic: {partition: off}}, max_wait_ms=100)
            info = resp[topic][partition]
            if info["error"]:
                raise IOError(f"fetch {topic}[{partition}]@{off}: kafka error {info['error']}")
            recs = KP.decode_record_batches(info["records"])
            for rec in recs:
                if rec.offset < off or rec.offset >= end:
                    continue  # whole-batch serving includes a prefix below `off`
                yield (topic, partition, rec.offset, rec.timestamp_ms,
                       rec.key, rec.value,
                       {k: v for k, v in rec.headers})
            if recs:
                empty_streak = 0
                new_off = max(r.offset for r in recs) + 1
                if new_off <= off:
                    raise IOError(f"fetch made no progress at {topic}[{partition}]@{off}")
                off = min(new_off, end)
            else:
                if info["high_watermark"] <= off:
                    return  # span ends at the log head
                empty_streak += 1
                if empty_streak > 50:
                    raise IOError(
                        f"fetch returned no records at {topic}[{partition}]@{off} "
                        f"below high watermark {info['high_watermark']} "
                        "(offset likely below log start / retention)")
    finally:
        client.close()


_TP_SEP = " "


def register_kafka_source(spark: SparkSession) -> None:
    """Register the `benthos_kafka` Python data source (idempotent).
    Offsets: {"topic partition": next_offset} — a space separator is
    unambiguous because Kafka topic names are [a-zA-Z0-9._-] only."""
    from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                        DataSourceStreamReader, InputPartition)
    from pyspark.sql.types import StructType

    class _Part(InputPartition):
        def __init__(self, address, topic, partition, start, end):
            self.address, self.topic, self.partition = address, topic, partition
            self.start, self.end = start, end

    def _discover(address: str, topics: list[str]) -> list[tuple[str, int]]:
        client = KafkaWireClient(address)
        try:
            md = client.metadata(topics)
            out = []
            for t in md["topics"]:
                if t["error"]:
                    raise IOError(f"metadata {t['name']}: kafka error {t['error']}")
                for p in t["partitions"]:
                    out.append((t["name"], p["partition"]))
            return sorted(out)
        finally:
            client.close()

    def _offsets_at(address: str, tps: list[tuple[str, int]], ts: int) -> dict[str, int]:
        client = KafkaWireClient(address)
        try:
            req: dict[str, dict[int, int]] = {}
            for t, p in tps:
                req.setdefault(t, {})[p] = ts
            got = client.list_offsets(req)
            return {f"{t}{_TP_SEP}{p}": got[t][p][1] for t, p in tps}
        finally:
            client.close()

    class _BatchReader(DataSourceReader):
        def __init__(self, options):
            self.address = options["address"]
            self.topics = options["topics"].split(",")

        def partitions(self):
            tps = _discover(self.address, self.topics)
            lo = _offsets_at(self.address, tps, -2)
            hi = _offsets_at(self.address, tps, -1)
            return [_Part(self.address, t, p,
                          lo[f"{t}{_TP_SEP}{p}"], hi[f"{t}{_TP_SEP}{p}"])
                    for t, p in tps]

        def read(self, part):
            yield from fetch_span(part.address, part.topic, part.partition,
                                  part.start, part.end)

    class _StreamReader(DataSourceStreamReader):
        # no sockets on the instance — Spark pickles the reader for
        # executor-side read() (same constraint as the redis source)
        def __init__(self, options):
            self.address = options["address"]
            self.topics = options["topics"].split(",")
            self.starting = options.get("starting_offsets", "earliest")
            self._tps = _discover(self.address, self.topics)

        def initialOffset(self):
            ts = -1 if self.starting == "latest" else -2
            return _offsets_at(self.address, self._tps, ts)

        def latestOffset(self):
            return _offsets_at(self.address, self._tps, -1)

        def partitions(self, start, end):
            out = []
            for t, p in self._tps:
                k = f"{t}{_TP_SEP}{p}"
                s, e = start.get(k, 0), end.get(k, 0)
                if e > s:
                    out.append(_Part(self.address, t, p, s, e))
            return out

        def read(self, part):
            yield from fetch_span(part.address, part.topic, part.partition,
                                  part.start, part.end)

        def commit(self, end):
            pass  # retention is broker-side; the checkpoint is the group state

    class _KafkaDataSource(DataSource):
        @classmethod
        def name(cls):
            return "benthos_kafka"

        def schema(self):
            return KAFKA_SCHEMA

        def reader(self, schema: StructType):
            return _BatchReader(self.options)

        def streamReader(self, schema: StructType):
            return _StreamReader(self.options)

    try:
        spark.dataSource.register(_KafkaDataSource)
    except Exception as e:
        if "already" not in str(e).lower():
            raise


@dataclass
class KafkaSource(Source):
    """`kafka`/`kafka_franz` input (input_kafka_franz.go): subscribe to
    topics, rows = (topic, partition, offset, timestamp_ms, key, value,
    headers). ``starting_offsets``: earliest|latest (the reference's
    start_from_oldest)."""

    address: str = ""
    topics: Sequence[str] = ()
    starting_offsets: str = "earliest"
    streaming: bool = True

    def read(self, spark: SparkSession) -> DataFrame:
        register_kafka_source(spark)
        reader = spark.readStream if self.streaming else spark.read
        return (reader.format("benthos_kafka")
                .option("address", self.address)
                .option("topics", ",".join(self.topics))
                .option("starting_offsets", self.starting_offsets)
                .load())


class KafkaSink:
    """`kafka` output (output_kafka_franz.go): produce each row's
    ``value`` (optionally ``key_col``/``headers_col``) to ``topic``.
    One connection per Spark partition; records grouped into magic-2
    batches of ``batch_records`` per target partition; key-partitioned
    with the Java client's murmur2 partitioner, unkeyed rows
    round-robin. acks=-1 (all) — at-least-once like the reference; the
    exactly-once upgrade is the downstream ledger sink's job."""

    def __init__(self, address: str, topic: str, col: str = "value",
                 key_col: Optional[str] = None,
                 headers_col: Optional[str] = None,
                 batch_records: int = 256):
        self.address, self.topic, self.col = address, topic, col
        self.key_col, self.headers_col = key_col, headers_col
        self.batch_records = batch_records

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        address, topic, col = self.address, self.topic, self.col
        key_col, headers_col = self.key_col, self.headers_col
        batch_records = self.batch_records
        cols = [col] + ([key_col] if key_col else []) + ([headers_col] if headers_col else [])

        def write_partition(rows):
            client = KafkaWireClient(address)
            try:
                md = client.metadata([topic])
                n_parts = len(md["topics"][0]["partitions"]) or 1
                pending: dict[int, list[KP.Record]] = {}
                counter = 0

                def flush(pid: int):
                    batch = pending.pop(pid, None)
                    if batch:
                        client.produce({topic: {pid: KP.encode_record_batch(batch)}})

                for row in rows:
                    v = row[col]
                    value = bytes(v) if isinstance(v, (bytes, bytearray)) else (
                        None if v is None else str(v).encode())
                    key = None
                    if key_col:
                        kv = row[key_col]
                        key = bytes(kv) if isinstance(kv, (bytes, bytearray)) else (
                            None if kv is None else str(kv).encode())
                    headers = []
                    if headers_col and row[headers_col]:
                        headers = [(hk, bytes(hv) if hv is not None else None)
                                   for hk, hv in row[headers_col].items()]
                    pid = partition_for_key(key, n_parts, counter)
                    counter += 1
                    pending.setdefault(pid, []).append(
                        KP.Record(key=key, value=value, headers=headers))
                    if len(pending[pid]) >= batch_records:
                        flush(pid)
                for pid in list(pending):
                    flush(pid)
            finally:
                client.close()

        df.select(*cols).foreachPartition(write_partition)

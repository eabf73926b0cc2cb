"""Kafka connector over the from-scratch wire protocol.

Protocol codec + MiniKafkaBroker live in functions/kafka_proto.py; the
Spark source/sink in operators/kafka.py. These tests pin public
protocol vectors (CRC32C RFC 3720, varint zigzag, murmur2 partitioner)
and drive real produce/fetch round trips over loopback TCP, then the
full Spark batch + streaming paths with checkpoint resume."""

from __future__ import annotations

import struct
import time

import pytest

from benthos_spark.functions import kafka_proto as KP
from benthos_spark.functions.kafka_proto import (MiniKafkaBroker, Reader,
                                                 Record, Writer, crc32c,
                                                 decode_record_batches,
                                                 encode_record_batch,
                                                 rewrite_base_offset)
from benthos_spark.operators.kafka import (KafkaSink, KafkaSource,
                                           KafkaWireClient, fetch_span,
                                           murmur2, partition_for_key)


@pytest.fixture()
def broker():
    b = MiniKafkaBroker(num_partitions=2).start()
    yield b
    b.stop()


@pytest.fixture()
def client(broker):
    c = KafkaWireClient(broker.address)
    yield c
    c.close()


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def test_crc32c_rfc3720_vectors():
    # RFC 3720 §B.4: 32 bytes of zeros / the ascii digits check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_varint_zigzag_roundtrip():
    for v in (0, 1, -1, 2, -2, 127, -128, 300, -300, 2**31, -(2**31), 2**62):
        w = Writer().varint(v)
        assert Reader(w.done()).varint() == v
    # known zigzag encodings (protobuf/kafka shared convention)
    assert Writer().varint(0).done() == b"\x00"
    assert Writer().varint(-1).done() == b"\x01"
    assert Writer().varint(1).done() == b"\x02"
    assert Writer().varint(-2).done() == b"\x03"


def test_murmur2_partitioner_vectors():
    # regression pins for the producer partitioner hash (any drift here
    # would silently re-shuffle keyed topics)
    assert murmur2(b"") == 0x106E08D9
    assert murmur2(b"a") == 0xA2D0B27C
    assert murmur2(b"abc") == 0x1C94221B
    assert murmur2(b"somekey") == 0x74D8A98E
    # Java default partitioner: positive-masked modulo; unkeyed round robin
    assert partition_for_key(b"somekey", 6) == (0x74D8A98E & 0x7FFFFFFF) % 6
    assert partition_for_key(None, 4, counter=5) == 1


def test_record_batch_roundtrip_and_crc():
    recs = [Record(key=b"k1", value=b"v1", headers=[("h", b"x")], timestamp_ms=1000),
            Record(key=None, value=b"v2", timestamp_ms=1005)]
    raw = encode_record_batch(recs, base_offset=7)
    out = decode_record_batches(raw)
    assert [(r.key, r.value, r.offset, r.timestamp_ms) for r in out] == [
        (b"k1", b"v1", 7, 1000), (None, b"v2", 8, 1005)]
    assert out[0].headers == [("h", b"x")]
    # base-offset rewrite is CRC-safe
    moved = rewrite_base_offset(raw, 100)
    assert [r.offset for r in decode_record_batches(moved)] == [100, 101]
    # corruption detected
    bad = raw[:-1] + bytes([raw[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="CRC"):
        decode_record_batches(bad)


def test_partial_trailing_batch_tolerated():
    raw = encode_record_batch([Record(key=None, value=b"a")])
    two = raw + raw[: len(raw) // 2]
    assert len(decode_record_batches(two)) == 1


# ---------------------------------------------------------------------------
# Broker + client
# ---------------------------------------------------------------------------


def test_api_versions_and_metadata(client, broker):
    vers = client.api_versions()
    assert vers[KP.API_PRODUCE] == (3, 3)
    md = client.metadata(["events"])
    assert md["topics"][0]["name"] == "events"
    assert len(md["topics"][0]["partitions"]) == 2
    host, port = broker.address.rsplit(":", 1)
    assert md["brokers"][0]["port"] == int(port)


def test_produce_fetch_roundtrip(client):
    batch = encode_record_batch([Record(key=b"k", value=b"hello"),
                                 Record(key=b"k", value=b"world")])
    resp = client.produce({"t1": {0: batch}})
    assert resp["t1"][0] == (0, 0)
    resp2 = client.produce({"t1": {0: encode_record_batch([Record(key=None, value=b"third")])}})
    assert resp2["t1"][0] == (0, 2)
    fetched = client.fetch({"t1": {0: 0}})
    recs = decode_record_batches(fetched["t1"][0]["records"])
    assert [r.value for r in recs] == [b"hello", b"world", b"third"]
    assert [r.offset for r in recs] == [0, 1, 2]
    assert fetched["t1"][0]["high_watermark"] == 3
    # fetch from the middle serves the containing batch; span filter trims
    rows = list(fetch_span(client.host + ":" + str(client.port), "t1", 0, 1, 3))
    assert [r[5] for r in rows] == [b"world", b"third"]


def test_list_offsets(client):
    client.produce({"t2": {1: encode_record_batch([Record(key=None, value=b"x")])}})
    lo = client.list_offsets({"t2": {1: -2}})
    hi = client.list_offsets({"t2": {1: -1}})
    assert lo["t2"][1][1] == 0 and hi["t2"][1][1] == 1


def test_fetch_long_poll_wakes_on_produce(broker):
    import threading

    c = KafkaWireClient(broker.address)
    c.metadata(["t3"])

    def produce_later():
        time.sleep(0.15)
        c2 = KafkaWireClient(broker.address)
        c2.produce({"t3": {0: encode_record_batch([Record(key=None, value=b"late")])}})
        c2.close()

    threading.Thread(target=produce_later, daemon=True).start()
    t0 = time.time()
    got = c.fetch({"t3": {0: 0}}, max_wait_ms=5000, min_bytes=1)
    took = time.time() - t0
    assert took < 4.0  # long poll returned on data, not timeout
    assert decode_record_batches(got["t3"][0]["records"])[0].value == b"late"
    c.close()


# ---------------------------------------------------------------------------
# Spark source / sink
# ---------------------------------------------------------------------------


def test_sink_then_batch_source_roundtrip(spark, broker):
    df = spark.createDataFrame(
        [(f"m{i}", f"key{i % 3}") for i in range(20)], "value string, k string")
    KafkaSink(broker.address, topic="clips", key_col="k")(df, 0)
    src = KafkaSource(address=broker.address, topics=["clips"], streaming=False)
    rows = src.read(spark).collect()
    assert sorted(bytes(r.value).decode() for r in rows) == sorted(f"m{i}" for i in range(20))
    # keyed rows co-partition (murmur2): every key maps to one partition
    by_key = {}
    for r in rows:
        by_key.setdefault(bytes(r.key), set()).add(r.partition)
    assert all(len(parts) == 1 for parts in by_key.values())
    # offsets are dense per partition
    for pid in {r.partition for r in rows}:
        offs = sorted(r.offset for r in rows if r.partition == pid)
        assert offs == list(range(len(offs)))


def test_streaming_source_incremental_and_resume(spark, broker, tmp_path):
    """Checkpointed streaming read: entries appended between micro-batches
    arrive exactly once; a NEW query on the SAME checkpoint resumes past
    what was committed."""
    c = KafkaWireClient(broker.address)
    c.produce({"s": {0: encode_record_batch([Record(key=None, value=b"first")])}})
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    src = KafkaSource(address=broker.address, topics=["s"])

    def run_until(n, deadline_s=45):
        q = (src.read(spark).writeStream.format("parquet")
             .option("checkpointLocation", ckpt).option("path", out)
             .trigger(processingTime="300 milliseconds").start())
        try:
            deadline = time.time() + deadline_s
            while time.time() < deadline:
                try:
                    if spark.read.parquet(out).count() >= n:
                        return
                except Exception:
                    pass
                time.sleep(0.4)
            raise AssertionError(f"never reached {n} rows")
        finally:
            q.stop()

    run_until(1)
    c.produce({"s": {1: encode_record_batch([Record(key=None, value=b"second")])}})
    run_until(2)  # new query, same checkpoint — resumes, no duplicates
    rows = spark.read.parquet(out).collect()
    assert sorted(bytes(r.value).decode() for r in rows) == ["first", "second"]
    assert len(rows) == 2
    c.close()


def test_config_wiring(broker):
    from benthos_spark.config import _input, _output

    src = _input({"kafka": {"address": broker.address, "topics": ["a"]}})
    assert isinstance(src, KafkaSource) and src.streaming
    sink = _output({"kafka": {"address": broker.address, "topic": "a"}})
    assert isinstance(sink, KafkaSink)
